"""Differentiable wrappers for the Pallas kernels.

Forward runs the fused TPU kernel; backward is the VJP of the numerically
identical XLA chain (the kernels are verified exact against it, so the
gradients are exact too). Under the trainer's per-frame ``jax.checkpoint``
this means the rematerialised forward also runs the fast kernel, while the
backward math stays plain XLA — no hand-written kernel gradients needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from turtlevsr_tpu.kernels.ffn import fused_block_ffn, fused_ln_qkv_dw


def _ln_xla(x, p, ln_mode):
    if ln_mode == "none":
        return x
    from turtlevsr_tpu.ops.norm import layer_norm

    return layer_norm(x, p["ln_w"], p.get("ln_b"))


def _dwconv_xla(h, wd, bd):
    from turtlevsr_tpu.ops.conv import conv2d

    ch = h.shape[-1]
    y = conv2d(h, wd.reshape(3, 3, 1, ch), bd, padding=1, groups=ch)
    return y


def _ffn_xla(x, p, mode, residual, ln_mode):
    """The jnp reference of fused_block_ffn (see kernels/ffn.py)."""
    if p.get("x2") is not None:
        entries = (list(p["x2"]) if isinstance(p["x2"], (list, tuple))
                   else [p["x2"]])
        # a 5-D entry is a stacked (B, M, H, W, C) frame buffer — flatten
        # to per-frame maps (matches the kernel's per-frame block streams)
        x2s = []
        for e in entries:
            if e.ndim == 5:
                x2s += [e[:, j] for j in range(e.shape[1])]
            else:
                x2s.append(e)
        pws = p.get("po_w")
        pws = (list(pws) if isinstance(pws, (list, tuple))
               else ([pws] if pws is not None else None))
        for j, x2 in enumerate(x2s):
            if pws is not None:  # fused attention project_out
                c = x2.shape[-1]
                pw = pws[j]
                if pw.ndim == 3:  # per-batch po' (fused attention)
                    # fp32 operands: batched bf16 dot_generals crash the
                    # CPU DotThunk (see CLAUDE.md); bf16 products are
                    # exact in fp32, so the result (cast back) is bitwise
                    # identical
                    x2 = jnp.einsum("bhwc,bce->bhwe",
                                    x2.astype(jnp.float32),
                                    pw.astype(jnp.float32),
                                    preferred_element_type=jnp.float32
                                    ).astype(x2.dtype)
                else:
                    x2 = jnp.dot(x2.reshape(-1, c), pw.astype(x2.dtype),
                                 preferred_element_type=x2.dtype
                                 ).reshape(x2.shape)
                if j == 0 and p.get("po_b") is not None:
                    x2 = x2 + p["po_b"]
            x = x + x2  # fused attention-residual add(s)
    xn = _ln_xla(x, p, ln_mode)
    c = x.shape[-1]
    h = jnp.einsum("bhwc,ce->bhwe", xn, p["w1"])
    if p.get("b1") is not None:
        h = h + p["b1"]
    if p.get("wd") is not None:
        h = _dwconv_xla(h, p["wd"], p.get("bd"))
    if mode == "linear":
        return h
    if mode == "gate":
        a, b = jnp.split(h, 2, axis=-1)
        act = jax.nn.gelu(a, approximate=False) * b
    else:
        act = jax.nn.gelu(h, approximate=False)
    out = jnp.einsum("bhwe,ec->bhwc", act, p["w2"])
    if p.get("b2") is not None:
        out = out + p["b2"]
    if p.get("scale") is not None:
        out = out * p["scale"]
    if residual:
        out = out + x
    if p.get("ffw2") is not None:
        # chained pointwise FFW second half (one-traversal ReducedAttn+FFW
        # block): y casts through the model dtype exactly like the kernel
        f2 = p["ffw2"]
        y = out.astype(x.dtype)
        yn = _ln_xla(y, f2, "with_bias" if f2.get("ln_b") is not None
                     else "bias_free")
        h2 = jnp.einsum("bhwc,ce->bhwe", yn, f2["w1"]) + f2["b1"]
        o2 = jnp.einsum("bhwe,ec->bhwc",
                        jax.nn.gelu(h2, approximate=False), f2["w2"])
        out = y + (o2 + f2["b2"]) * f2["scale"]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ffn_op(x, p, statics):
    mode, residual, ln_mode, interpret = statics
    kw = dict(ln_w=p.get("ln_w"), ln_b=p.get("ln_b"), w1=p["w1"],
              b1=p.get("b1"), wd=p.get("wd"), bd=p.get("bd"),
              w2=p.get("w2"), b2=p.get("b2"), scale=p.get("scale"),
              x2=p.get("x2"), po_w=p.get("po_w"), po_b=p.get("po_b"),
              ffw2=p.get("ffw2"))
    if mode == "linear":
        return fused_ln_qkv_dw(x, ln_w=kw["ln_w"], ln_b=kw["ln_b"],
                               w1=kw["w1"], b1=kw["b1"], wd=kw["wd"],
                               bd=kw["bd"], interpret=interpret)
    return fused_block_ffn(x, mode=mode, residual=residual,
                           interpret=interpret, **kw)


def _ffn_fwd(x, p, statics):
    return ffn_op(x, p, statics), (x, p)


def _ffn_bwd(statics, res, g):
    mode, residual, ln_mode, _ = statics
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _ffn_xla(x_, p_, mode, residual, ln_mode),
                     x, p)
    return vjp(g)


ffn_op.defvjp(_ffn_fwd, _ffn_bwd)


def call_fused_ffn(x, *, mode, residual=True, interpret=False, ln_w=None,
                   ln_b=None, w1, b1=None, wd=None, bd=None, w2=None,
                   b2=None, scale=None, x2=None, po_w=None, po_b=None,
                   ffw2=None):
    """Differentiable fused FFN/projection (drop-in for fused_block_ffn /
    fused_ln_qkv_dw). Weight layout: w1 (C, CH), wd (3, 3, CH), w2 (E, C).
    x2: optional fused second addend (the attention branch's residual).
    ffw2: optional chained pointwise FFW half (one-traversal block)."""
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    p = {k: v for k, v in dict(ln_w=ln_w, ln_b=ln_b, w1=w1, b1=b1, wd=wd,
                               bd=bd, w2=w2, b2=b2, scale=scale,
                               x2=x2, po_w=po_w, po_b=po_b,
                               ffw2=ffw2).items()
         if v is not None}
    return ffn_op(x, p, (mode, residual, ln_mode, interpret))


def _stage_to_ffn_p(st, ffw):
    p = {k: v for k, v in dict(
        ln_w=st.get("ln_w"), ln_b=st.get("ln_b"), w1=st["w1"],
        b1=st.get("b1"), wd=st["wd"], bd=st.get("bd"), w2=st["w2"],
        b2=st.get("b2"), scale=st.get("scale")).items() if v is not None}
    if ffw is not None:
        p["ffw2"] = ffw
    return p


def _two_stage_xla(x, p, modes):
    """XLA reference of the two-stage chained kernel: each stage is
    exactly the _ffn_xla chain (incl. the chained pointwise FFW)."""
    for st_key, f_key, mode in (("st1", "ffw1", modes[0]),
                                ("st2", "ffw2", modes[1])):
        pp = _stage_to_ffn_p(p[st_key], p.get(f_key))
        ln_mode = ("none" if pp.get("ln_w") is None
                   else ("bias_free" if pp.get("ln_b") is None
                         else "with_bias"))
        x = _ffn_xla(x, pp, mode, True, ln_mode)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def two_stage_op(x, p, statics):
    from turtlevsr_tpu.kernels.chain2 import fused_two_stage

    interpret, m1, m2 = statics
    st1 = dict(p["st1"], mode=m1)
    st2 = dict(p["st2"], mode=m2)
    return fused_two_stage(x, st1, st2, ffw1=p.get("ffw1"),
                           ffw2=p.get("ffw2"), interpret=interpret)


def _two_stage_fwd(x, p, statics):
    return two_stage_op(x, p, statics), (x, p)


def _two_stage_bwd(statics, res, g):
    _, m1, m2 = statics
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _two_stage_xla(x_, p_, (m1, m2)), x, p)
    return vjp(g)


two_stage_op.defvjp(_two_stage_fwd, _two_stage_bwd)


def call_two_stage(x, st1, st2, ffw1=None, ffw2=None, interpret=False):
    """Differentiable two-stage chained kernel (kernels/chain2.py): a
    pair of ReducedAttn+FFW blocks, or one ReducedAttn+GFFW block, in
    ONE map traversal. st dicts carry arrays + a 'mode' string (hoisted
    to statics here — strings can't ride the traced pytree)."""
    m1, m2 = st1["mode"], st2["mode"]
    p = {"st1": {k: v for k, v in st1.items() if k != "mode" and v is not None},
         "st2": {k: v for k, v in st2.items() if k != "mode" and v is not None}}
    if ffw1 is not None:
        p["ffw1"] = {k: v for k, v in ffw1.items() if v is not None}
    if ffw2 is not None:
        p["ffw2"] = {k: v for k, v in ffw2.items() if v is not None}
    return two_stage_op(x, p, (interpret, m1, m2))


def _split_proj_xla(x, p, ln_mode):
    """XLA reference of fused_ln_split_proj: one LN, N pw+dw chains."""
    xn = _ln_xla(x, p, ln_mode)
    outs = []
    for proj in p["projs"]:
        h = jnp.einsum("bhwc,ce->bhwe", xn, proj["w1"])
        if proj.get("b1") is not None:
            h = h + proj["b1"]
        h = _dwconv_xla(h, proj["wd"], proj.get("bd"))
        outs.append(h)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def split_proj_op(x, p, statics):
    from turtlevsr_tpu.kernels.ffn import fused_ln_split_proj

    ln_mode, interpret = statics
    return fused_ln_split_proj(x, p["projs"], ln_w=p.get("ln_w"),
                               ln_b=p.get("ln_b"), interpret=interpret)


def _split_proj_fwd(x, p, statics):
    return split_proj_op(x, p, statics), (x, p)


def _split_proj_bwd(statics, res, g):
    ln_mode, _ = statics
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _split_proj_xla(x_, p_, ln_mode), x, p)
    return vjp(g)


split_proj_op.defvjp(_split_proj_fwd, _split_proj_bwd)


def call_split_proj(x, projs, *, ln_w=None, ln_b=None, interpret=False):
    """Differentiable fused multi-output projection (kernels/ffn.py
    fused_ln_split_proj): N chains dw3x3(pw(LN(x))), one pass over x."""
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    p = {"projs": [
        {k: v for k, v in pr.items() if v is not None} for pr in projs]}
    if ln_w is not None:
        p["ln_w"] = ln_w
    if ln_b is not None:
        p["ln_b"] = ln_b
    return split_proj_op(x, p, (ln_mode, interpret))


def _qkv_stats_xla(x, p, ln_mode):
    """XLA reference of fused_qkv_stats: the q/k/v chains + gram/norm
    reductions (what channel attention consumes — turtle_arch.py:589-625)."""
    q, k, v = _split_proj_xla(x, p, ln_mode)
    b, _, _, e = q.shape
    # fp32 operands: non-canonical bf16 dot_generals crash the CPU
    # DotThunk (CLAUDE.md); bf16 products are exact in fp32 — identical
    qf = q.reshape(b, -1, e).astype(jnp.float32)
    kf = k.reshape(b, -1, e).astype(jnp.float32)
    g = jnp.einsum("blc,bld->bcd", qf, kf,
                   preferred_element_type=jnp.float32)
    nq = jnp.einsum("blc,blc->bc", qf, qf,
                    preferred_element_type=jnp.float32)
    nk = jnp.einsum("blc,blc->bc", kf, kf,
                    preferred_element_type=jnp.float32)
    s = jnp.zeros((b, 8, 2 * e), jnp.float32).at[:, 0].set(
        jnp.concatenate([nq, nk], axis=-1))
    return v, g, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def qkv_stats_op(x, p, statics):
    from turtlevsr_tpu.kernels.ffn import fused_qkv_stats

    ln_mode, interpret = statics
    return fused_qkv_stats(x, p["projs"], ln_w=p.get("ln_w"),
                           ln_b=p.get("ln_b"), interpret=interpret)


def _qkv_stats_fwd(x, p, statics):
    return qkv_stats_op(x, p, statics), (x, p)


def _qkv_stats_bwd(statics, res, g):
    ln_mode, _ = statics
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _qkv_stats_xla(x_, p_, ln_mode), x, p)
    return vjp(g)


qkv_stats_op.defvjp(_qkv_stats_fwd, _qkv_stats_bwd)


def call_qkv_stats(x, projs, *, ln_w=None, ln_b=None, interpret=False):
    """Differentiable fused qkv + channel-attention statistics
    (kernels/ffn.py fused_qkv_stats)."""
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    p = {"projs": [
        {k: v for k, v in pr.items() if v is not None} for pr in projs]}
    if ln_w is not None:
        p["ln_w"] = ln_w
    if ln_b is not None:
        p["ln_b"] = ln_b
    return qkv_stats_op(x, p, (ln_mode, interpret))


def _chm_stats_xla(x, x_sp, p, ln_mode):
    """XLA reference of fused_chm_stats (turtle_arch.py:535-585 front)."""
    if isinstance(x_sp, (list, tuple)):  # per-frame streams: stack is exact
        x_sp = jnp.stack(x_sp, axis=1)
    q, k, v = _split_proj_xla(x, {"projs": p["qkv"],
                                  **{kk: p[kk] for kk in ("ln_w", "ln_b")
                                     if kk in p}}, ln_mode)
    b, nf = x_sp.shape[:2]
    c = x.shape[-1]
    xs = x_sp.reshape((b * nf,) + x_sp.shape[2:])
    kh, vh = _split_proj_xla(xs, {"projs": p["kv"]}, "none")
    # fp32 operands for the CPU DotThunk (see _qkv_stats_xla)
    qf = q.reshape(b, -1, c).astype(jnp.float32)
    kf = k.reshape(b, -1, c).astype(jnp.float32)
    khf = kh.reshape(b, nf, -1, c).astype(jnp.float32)
    g = jnp.einsum("blc,bld->bcd", qf, kf,
                   preferred_element_type=jnp.float32)
    gh = jnp.einsum("blc,bnld->bncd", qf, khf,
                    preferred_element_type=jnp.float32)
    sq = jnp.einsum("blc,blc->bc", qf, qf, preferred_element_type=jnp.float32)
    sk = jnp.einsum("blc,blc->bc", kf, kf, preferred_element_type=jnp.float32)
    sh = jnp.einsum("bnlc,bnlc->bnc", khf, khf,
                    preferred_element_type=jnp.float32)
    s = jnp.zeros((b, nf + 2, 8, c), jnp.float32)
    s = s.at[:, 0, 0].set(sq).at[:, 1, 0].set(sk)
    s = s.at[:, 2:, 0].set(sh)
    return (v, vh.reshape(b, nf, *x.shape[1:3], c), g, gh, s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chm_stats_op(x, x_sp, p, statics):
    from turtlevsr_tpu.kernels.ffn import fused_chm_stats

    ln_mode, interpret = statics
    return fused_chm_stats(x, x_sp, p["qkv"], p["kv"], ln_w=p.get("ln_w"),
                           ln_b=p.get("ln_b"), interpret=interpret)


def _chm_stats_fwd(x, x_sp, p, statics):
    return chm_stats_op(x, x_sp, p, statics), (x, x_sp, p)


def _chm_stats_bwd(statics, res, g):
    ln_mode, _ = statics
    x, x_sp, p = res
    _, vjp = jax.vjp(
        lambda x_, xs_, p_: _chm_stats_xla(x_, xs_, p_, ln_mode), x, x_sp, p)
    return vjp(g)


chm_stats_op.defvjp(_chm_stats_fwd, _chm_stats_bwd)


def call_chm_stats(x, x_sp, qkv, kv, *, ln_w=None, ln_b=None,
                   interpret=False):
    """Differentiable fused CHM projections + routing statistics
    (kernels/ffn.py fused_chm_stats)."""
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    p = {"qkv": [{k: v for k, v in pr.items() if v is not None}
                 for pr in qkv],
         "kv": [{k: v for k, v in pr.items() if v is not None}
                for pr in kv]}
    if ln_w is not None:
        p["ln_w"] = ln_w
    if ln_b is not None:
        p["ln_b"] = ln_b
    return chm_stats_op(x, x_sp, p, (ln_mode, interpret))


def _run_block_inputs(bp, spec):
    """Per-block pre-split weight dict for the level megakernel
    (kernels/level.py) from an attn-block param tree."""
    c = spec.dim
    a = bp["attn"]
    w3 = a["qkv"]["weight"].reshape(c, 3 * c)
    wd3 = a["qkv_dwconv"]["weight"].reshape(3, 3, 3 * c)
    f = bp["ffn"]
    hid = f["project_in"]["weight"].shape[-1]
    e = hid // 2
    w1g = f["project_in"]["weight"].reshape(c, hid)
    wdg = f["dwconv"]["weight"].reshape(3, 3, hid)
    d = {
        "ln1_w": bp["norm1"]["body"]["weight"],
        "ln1_b": bp["norm1"]["body"].get("bias"),
        "w1_q": w3[:, :c], "wd_q": wd3[:, :, :c],
        "w1_k": w3[:, c:2 * c], "wd_k": wd3[:, :, c:2 * c],
        "w1_v": w3[:, 2 * c:], "wd_v": wd3[:, :, 2 * c:],
        "temp": a["temperature"],
        "wpo": a["project_out"]["weight"].reshape(c, c),
        "ln2_w": bp["norm2"]["body"]["weight"],
        "ln2_b": bp["norm2"]["body"].get("bias"),
        "w1_a": w1g[:, :e], "wd_a": wdg[:, :, :e],
        "w1_b": w1g[:, e:], "wd_b": wdg[:, :, e:],
        "w2": f["project_out"]["weight"].reshape(e, c),
    }
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def channel_run_op(x, p, statics):
    from turtlevsr_tpu.kernels.level import fused_channel_gffw_run

    spec, interpret = statics
    blocks = [_run_block_inputs(bp, spec) for bp in p["blocks"]]
    ln_mode = ("with_bias" if blocks[0]["ln1_b"] is not None
               else "bias_free")
    return fused_channel_gffw_run(x, blocks, heads=spec.num_heads,
                                  ln_mode=ln_mode, interpret=interpret)


def _channel_run_xla(x, p, spec):
    import dataclasses

    from turtlevsr_tpu.models import blocks as B

    spec_x = dataclasses.replace(spec, kernels="xla")
    for bp in p["blocks"]:
        x, _ = B.attn_block_apply(bp, x, spec_x, None)
    return x


def _channel_run_fwd(x, p, statics):
    return channel_run_op(x, p, statics), (x, p)


def _channel_run_bwd(statics, res, g):
    spec, _ = statics
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: _channel_run_xla(x_, p_, spec), x, p)
    return vjp(g)


channel_run_op.defvjp(_channel_run_fwd, _channel_run_bwd)


def call_channel_run(x, params_list, spec, interpret=False):
    """Differentiable level megakernel: a run of cacheless Channel+GFFW
    blocks with the map resident in VMEM (kernels/level.py)."""
    return channel_run_op(x, {"blocks": list(params_list)},
                          (spec, interpret))


def _conv3_xla(x, p):
    from turtlevsr_tpu.ops.conv import conv2d
    from turtlevsr_tpu.ops.norm import layer_norm

    if "ln_w" in p:
        x = layer_norm(x, p["ln_w"], p.get("ln_b"))
    return conv2d(x, p["weight"], p.get("bias"), padding=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3_op(x, p, interpret=False):
    from turtlevsr_tpu.kernels.ffn import fused_conv3x3

    return fused_conv3x3(x, p["weight"], p.get("bias"),
                         ln_w=p.get("ln_w"), ln_b=p.get("ln_b"),
                         interpret=interpret)


def _conv3_fwd(x, p, interpret):
    return conv3_op(x, p, interpret), (x, p)


def _conv3_bwd(interpret, res, g):
    x, p = res
    _, vjp = jax.vjp(_conv3_xla, x, p)
    return vjp(g)


conv3_op.defvjp(_conv3_fwd, _conv3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sab_attn_probs_op(q, kt, local_mask, temp, fvalid, statics):
    """statics: (interpret, grid_wq) — REQUIRED (no default: a defaulted
    grid_wq=0 would reach the in-kernel mask's `qidx // wq`, ADVICE r4).
    The kernel computes the local mask from iotas in-kernel (grid_wq
    static); the local_mask ARRAY is kept as a traced arg only for the
    XLA-reference backward — in an inference-only graph it is dead and
    XLA DCEs its construction."""
    from turtlevsr_tpu.kernels.sab import sab_fused_attn_probs

    interpret, grid_wq = statics
    return sab_fused_attn_probs(q, kt, grid_wq, temp, fvalid,
                                interpret=interpret)


def _sab_attn_probs_xla(q, kt, local_mask, temp, fvalid):
    from turtlevsr_tpu.ops.attn_utils import clipped_softmax, topk_keep

    # fp32 operands for the CPU DotThunk (see _qkv_stats_xla)
    scores = jnp.einsum("bqd,bndk->bnqk", q.astype(jnp.float32),
                        kt.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = (scores * temp).astype(q.dtype)
    probs = clipped_softmax(topk_keep(scores, 5)
                            + scores * local_mask[None, None])
    # the kernel folds the per-frame validity into the probabilities
    return probs * fvalid.astype(probs.dtype)[None, :, None, None]


def _sab_attn_probs_fwd(q, kt, local_mask, temp, fvalid, statics):
    return (sab_attn_probs_op(q, kt, local_mask, temp, fvalid, statics),
            (q, kt, local_mask, temp, fvalid))


def _sab_attn_probs_bwd(statics, res, g):
    q, kt, local_mask, temp, fvalid = res
    _, vjp = jax.vjp(_sab_attn_probs_xla, q, kt, local_mask, temp, fvalid)
    return vjp(g)


sab_attn_probs_op.defvjp(_sab_attn_probs_fwd, _sab_attn_probs_bwd)


def _av_merge_xla(a, v, ws, h, w):
    from turtlevsr_tpu.models.blocks import _lattice_merge

    # fp32 operands for the CPU DotThunk (see _qkv_stats_xla)
    out_tok = jnp.einsum("bqk,bkd->bqd", a.astype(jnp.float32),
                         v.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(a.dtype)
    return _lattice_merge(out_tok, ws, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sab_av_merge_op(a, v, statics):
    """Differentiable fused attention@values + lattice merge
    (kernels/sab.py sab_attn_v_merge)."""
    from turtlevsr_tpu.kernels.sab import sab_attn_v_merge

    ws, h, w, interpret = statics
    return sab_attn_v_merge(a, v, ws, h, w, interpret)


def _av_merge_fwd(a, v, statics):
    return sab_av_merge_op(a, v, statics), (a, v)


def _av_merge_bwd(statics, res, g):
    ws, h, w, _ = statics
    a, v = res
    _, vjp = jax.vjp(lambda a_, v_: _av_merge_xla(a_, v_, ws, h, w), a, v)
    return vjp(g)


sab_av_merge_op.defvjp(_av_merge_fwd, _av_merge_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sab_softmax_op(scores, local_mask, interpret=False):
    from turtlevsr_tpu.kernels.sab import sab_sparse_softmax

    return sab_sparse_softmax(scores, local_mask, interpret=interpret)


def _sab_xla(scores, local_mask):
    from turtlevsr_tpu.ops.attn_utils import clipped_softmax, topk_keep

    return clipped_softmax(topk_keep(scores, 5) + scores * local_mask[None])


def _sab_fwd(scores, local_mask, interpret):
    return sab_softmax_op(scores, local_mask, interpret), (scores, local_mask)


def _sab_bwd(interpret, res, g):
    scores, local_mask = res
    _, vjp = jax.vjp(_sab_xla, scores, local_mask)
    return vjp(g)


sab_softmax_op.defvjp(_sab_fwd, _sab_bwd)
