"""The Turtle block zoo, functional JAX, NHWC.

Every block is a pair of functions: ``*_init(key, ...) -> params`` (PyTorch
initialisation statistics, so training from scratch matches the reference
recipe) and ``*_apply(params, x, ...) -> (y, new_cache_slot | None)``.
Parameter trees mirror the reference's module names 1:1
(e.g. ``attn.qkv_dwconv.weight``) so torch checkpoints convert mechanically.

Reference: basicsr/models/archs/turtle_arch.py (t0) and turtle_t1_arch.py
(t1/sr). The behavioural quirks documented in SURVEY.md §2.2 (Q1/Q2) are
reproduced deliberately; each is flagged inline.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from turtlevsr_tpu.core.cache import (
    fhr_slot_append,
    frame_valid_mask,
    sab_slot_append,
    sab_slot_append_v,
    token_valid_mask,
)
from turtlevsr_tpu.ops.attn_utils import (
    acc_dtype,
    clipped_softmax,
    l2_normalize,
    local_window_mask,
    masked_softmax,
    topk_keep,
)
from turtlevsr_tpu.ops.conv import conv_init
from turtlevsr_tpu.ops.norm import layer_norm, layer_norm_init

# debug instrument (tools/sab_sparsity.py): when set to a list, every SAB
# attention-probability tensor computed on the XLA path is streamed to it
# via jax.debug.callback as (probs, grid_wq). Measurement-only.
_SAB_PROBS_TAP = None


def _sab_probs_sink(a, wq):
    if _SAB_PROBS_TAP is not None:
        # append WITHOUT converting: np.asarray here runs on the runtime's
        # callback thread and can deadlock against a main thread blocked in
        # block_until_ready (observed hang, faulthandler-confirmed); the
        # collector converts on the main thread after the step completes
        _SAB_PROBS_TAP.append((a, int(wq)))


@dataclass(frozen=True)
class BlockSpec:
    """Static per-block attention configuration."""

    attn_type: str  # Channel | ReducedAttn | FHR | CHM | NoAttn
    ffw_type: str  # FFW | GFFW
    dim: int
    num_heads: int
    ffn_expansion_factor: float
    bias: bool
    layernorm_bias: bool
    num_frames_tocache: int
    scale_patchsize: int = 1
    variant: str = "t1"  # t0 | t1 (sr shares t1 block semantics)
    kernels: str = "xla"  # "xla" | "pallas"

    @property
    def window_size(self) -> int:
        return 2 * self.scale_patchsize


def _conv(params, x, *, stride=1, padding=0):
    """conv with groups inferred from the kernel shape (depthwise-aware)."""
    from turtlevsr_tpu.ops.conv import conv2d

    w = params["weight"]
    groups = x.shape[-1] // w.shape[2]
    return conv2d(x, w, params.get("bias"), stride=stride, padding=padding,
                  groups=groups)


# ---------------------------------------------------------------------------
# Feed-forward networks
# ---------------------------------------------------------------------------


def ffw_init(key, c: int, dtype=jnp.float32) -> dict:
    """NAFNet-style FFN (turtle_arch.py:184-213). conv biases are True in the
    reference regardless of the global `bias` option; gamma is zero-init."""
    k1, k2 = jax.random.split(key)
    return {
        "conv4": conv_init(k1, c, 2 * c, 1, bias=True, dtype=dtype),
        "conv5": conv_init(k2, 2 * c, c, 1, bias=True, dtype=dtype),
        "gamma": jnp.zeros((c,), dtype),
    }


def ffw_apply(params, x):
    y = _conv(params["conv4"], x)
    y = jax.nn.gelu(y, approximate=False)
    y = _conv(params["conv5"], y)
    return y * params["gamma"].astype(y.dtype)


def gffw_init(key, dim: int, ffn_expansion_factor: float, bias: bool,
              dtype=jnp.float32) -> dict:
    """Restormer-style gated FFN (turtle_arch.py:162-181)."""
    hidden = int(dim * ffn_expansion_factor)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "project_in": conv_init(k1, dim, hidden * 2, 1, bias=bias, dtype=dtype),
        "dwconv": conv_init(k2, hidden * 2, hidden * 2, 3, groups=hidden * 2,
                            bias=bias, dtype=dtype),
        "project_out": conv_init(k3, hidden, dim, 1, bias=bias, dtype=dtype),
    }


def gffw_apply(params, x):
    y = _conv(params["project_in"], x)
    y = _conv(params["dwconv"], y, padding=1)
    x1, x2 = jnp.split(y, 2, axis=-1)
    y = jax.nn.gelu(x1, approximate=False) * x2
    return _conv(params["project_out"], y)


# ---------------------------------------------------------------------------
# Cache-free attentions
# ---------------------------------------------------------------------------


def reduced_attn_init(key, c: int, dw_expand: float = 2.0,
                      dtype=jnp.float32) -> dict:
    """NAFNet-ish conv token mixer (turtle_arch.py:627-665); biases True,
    beta zero-init."""
    dw = int(c * dw_expand)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": conv_init(k1, c, dw, 1, bias=True, dtype=dtype),
        "conv2": conv_init(k2, dw, dw, 3, groups=dw, bias=True, dtype=dtype),
        "conv3": conv_init(k3, dw, c, 1, bias=True, dtype=dtype),
        "beta": jnp.zeros((c,), dtype),
    }


def reduced_attn_apply(params, x):
    y = _conv(params["conv1"], x)
    y = _conv(params["conv2"], y, padding=1)
    y = jax.nn.gelu(y, approximate=False)
    y = _conv(params["conv3"], y)
    return y * params["beta"].astype(y.dtype), None


def _proj_dw(params, names, x, ln, spec):
    """pw1x1 + dw3x3 projection, optionally preceded by channel LN.

    With kernels == 'pallas' (and a supported shape) this is ONE fused
    Pallas pass (kernels/ffn.py fused_ln_qkv_dw); otherwise layer_norm +
    two convs via XLA."""
    pw, dw = params[names[0]], params[names[1]]
    c = x.shape[-1]
    ch = pw["weight"].shape[-1]
    if spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.ffn import ffn_pallas_supported
        from turtlevsr_tpu.kernels.vjp import call_fused_ffn

        h, w = x.shape[1], x.shape[2]
        if ffn_pallas_supported(h, w, c, ch, True):
            return call_fused_ffn(
                x, mode="linear", residual=False,
                ln_w=ln[0] if ln else None,
                ln_b=ln[1] if ln else None,
                w1=pw["weight"].reshape(c, ch), b1=pw.get("bias"),
                wd=dw["weight"].reshape(3, 3, ch), bd=dw.get("bias"),
                interpret=_pallas_interpret())
    xn = layer_norm(x, ln[0], ln[1]) if ln else x
    return _conv(dw, _conv(pw, xn), padding=1)


def _multi_proj_dw(params, groups, x, ln, spec):
    """N pw1x1+dw3x3 projection chains over LN(x), x read ONCE.

    groups: list of (pw_name, dw_name, n_chunks); each projection's output
    channels are returned as n_chunks separate maps (the q/k/v thirds etc.),
    so downstream attention never slices an interleaved (B, L, 3c) tensor.
    Pallas path: one fused multi-output kernel (kernels/ffn.py); XLA path:
    per-group conv + split (numerically identical).
    """
    c = x.shape[-1]
    if spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.ffn import split_proj_supported
        from turtlevsr_tpu.kernels.vjp import call_split_proj

        projs = []
        e_dims = set()
        for pw_name, dw_name, n in groups:
            pw, dw = params[pw_name], params[dw_name]
            ch = pw["weight"].shape[-1]
            e = ch // n
            e_dims.add(e)
            w1 = pw["weight"].reshape(c, ch)
            wd = dw["weight"].reshape(3, 3, ch)
            b1 = pw.get("bias")
            bd = dw.get("bias")
            for i in range(n):
                sl = slice(i * e, (i + 1) * e)
                projs.append(dict(
                    w1=w1[:, sl], wd=wd[:, :, sl],
                    b1=None if b1 is None else b1[sl],
                    bd=None if bd is None else bd[sl]))
        h, w = x.shape[1], x.shape[2]
        if len(e_dims) == 1 and split_proj_supported(h, w, c, e_dims.pop(),
                                                     len(projs)):
            return call_split_proj(
                x, projs, ln_w=ln[0] if ln else None,
                ln_b=ln[1] if ln else None, interpret=_pallas_interpret())
    outs = []
    for pw_name, dw_name, n in groups:
        y = _proj_dw(params, (pw_name, dw_name), x, ln, spec)
        outs.extend(jnp.split(y, n, axis=-1) if n > 1 else [y])
    return tuple(outs)


def _ln_args(params, key):
    body = params[key]["body"]
    return (body["weight"], body.get("bias"))


def _qkv_proj_init(key, dim: int, bias: bool, heads: int, dtype) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "temperature": jnp.ones((heads, 1, 1), dtype),
        "qkv": conv_init(k1, dim, dim * 3, 1, bias=bias, dtype=dtype),
        "qkv_dwconv": conv_init(k2, dim * 3, dim * 3, 3, groups=dim * 3,
                                bias=bias, dtype=dtype),
        "project_out": conv_init(k3, dim, dim, 1, bias=bias, dtype=dtype),
    }


def channel_attention_init(key, dim: int, heads: int, bias: bool,
                           dtype=jnp.float32) -> dict:
    """Transposed (channel-token) attention, no cache (turtle_arch.py:589-625)."""
    return _qkv_proj_init(key, dim, bias, heads, dtype)


def fhr_init(key, dim: int, heads: int, bias: bool, dtype=jnp.float32) -> dict:
    """FrameHistoryRouter (turtle_arch.py:220-288): same projection stack as
    ChannelAttention plus the truncated channel-token KV cache."""
    return _qkv_proj_init(key, dim, bias, heads, dtype)


def _fhr_attend(params, x, heads: int, k_hist=None, v_hist=None,
                hist_valid=None, ln=None, spec=None, skip_po=False):
    """Core of FHR/ChannelAttention: channel-token cross attention of the
    current frame over [history ‖ current] keys/values.

    The history tokens (if any) come first, exactly like the reference's
    ``torch.cat([k_cached, k], dim=2)`` (turtle_arch.py:273-275); masked-out
    history tokens are numerically absent from the softmax.

    TPU note: the reference's formulation l2-normalises the transposed
    (ctok, h*w) token tensors and matmuls them — materialising several
    full-map copies (~9.5 GB of HBM traffic per 720p block). Here the Gram
    matrix is contracted DIRECTLY from the map layout (B, L, heads, ctok)
    and normalised by the per-token norms afterwards — identical math
    (q/|q|)·(k/|k|) = (q·k)/(|q||k|), but the only big tensors ever written
    are the qkv maps themselves.

    Returns (out_map, k_tokens, v_tokens) with k/v being the CURRENT frame's
    normalised tokens in cache layout (B, heads, ctok, L).
    """
    b, h, w, c = x.shape
    l = h * w
    ctok = c // heads
    q, k, v = _multi_proj_dw(params, [("qkv", "qkv_dwconv", 3)], x, ln, spec)
    q = q.reshape(b, l, heads, ctok)  # contiguous, no interleaved slicing
    k = k.reshape(b, l, heads, ctok)
    v = v.reshape(b, l, heads, ctok)

    ad = acc_dtype(x.dtype)
    eps = jnp.asarray(1e-12, ad)  # torch F.normalize clamp

    def norms(t):
        sq = jnp.einsum("blhc,blhc->bhc", t, t, preferred_element_type=ad)
        return jnp.maximum(_safe_norm(sq), eps)

    nq = norms(q)  # (B, heads, ctok)
    nk = norms(k)

    # normalised Gram of current-frame tokens: (q/|q|)·(k/|k|)
    g = jnp.einsum("blhc,blhd->bhcd", q, k, preferred_element_type=ad)
    g = g / (nq[:, :, :, None] * nk[:, :, None, :])

    if k_hist is not None:
        # history keys are stored pre-normalised (B, heads, T*ctok, L)
        gh = jnp.einsum("blhc,bhdl->bhcd", q, k_hist,
                        preferred_element_type=ad)
        gh = gh / nq[:, :, :, None]
        scores = jnp.concatenate([gh, g], axis=-1)
        if hist_valid is not None:
            cur_valid = jnp.ones((ctok,), bool)
            valid = jnp.concatenate([hist_valid, cur_valid])[None, None,
                                                             None, :]
        else:
            valid = None
    else:
        scores, valid = g, None

    temp = params["temperature"].astype(ad)[None]  # (1, heads, 1, 1)
    attn = masked_softmax(scores * temp, valid)
    attn = attn.astype(x.dtype)

    if k_hist is not None:
        nh = k_hist.shape[2]
        attn_hist, attn_cur = attn[..., :nh], attn[..., nh:]
        out = jnp.einsum("bhcd,blhd->blhc", attn_cur, v,
                         preferred_element_type=ad)
        out = out + jnp.einsum("bhcd,bhdl->blhc", attn_hist,
                               v_hist.astype(x.dtype),
                               preferred_element_type=ad)
    else:
        out = jnp.einsum("bhcd,blhd->blhc", attn, v,
                         preferred_element_type=ad)
    out = out.astype(x.dtype).reshape(b, h, w, c)
    if not skip_po:  # else project_out fuses into the FFN kernel
        out = _conv(params["project_out"], out)

    # cache-layout current tokens (normalised k, raw v), (B, heads, ctok, L)
    k_cache = (k.astype(ad) / nk[:, None]).astype(x.dtype)
    k_cache = k_cache.transpose(0, 2, 3, 1)
    v_cache = v.transpose(0, 2, 3, 1)
    return out, k_cache, v_cache


def channel_attention_apply(params, x, heads: int, ln=None, spec=None,
                            skip_po=False):
    out, _, _ = _fhr_attend(params, x, heads, ln=ln, spec=spec,
                            skip_po=skip_po)
    return out, None


def channel_stats_supported(params, x, spec) -> bool:
    from turtlevsr_tpu.kernels.ffn import qkv_stats_supported

    return qkv_stats_supported(x.shape[1], x.shape[2], spec.dim)


def channel_attention_stats_apply(params, x, heads: int, ln, spec):
    """Cacheless channel attention via the stats kernel
    (kernels/ffn.py fused_qkv_stats): the q/k maps never leave VMEM and the
    attention application folds into the downstream FFN kernel.

    Channel attention's output is out = v @ blockdiag(attn^T), followed by
    project_out — so out @ W_po = v @ (blockdiag(attn^T) @ W_po). The kernel
    emits just the v map plus the Gram/norm statistics; the (heads, ctok,
    ctok) softmax and the tiny po' product run in XLA. Returns
    (v_map, po_w' (B, C, C), po_b) for the FFN pair/po path
    (ref turtle_arch.py:589-625)."""
    b, h, w, c = x.shape
    ctok = c // heads
    pw, dw = params["qkv"], params["qkv_dwconv"]
    ch = pw["weight"].shape[-1]
    w1 = pw["weight"].reshape(c, ch)
    wd = dw["weight"].reshape(3, 3, ch)
    b1 = pw.get("bias")
    bd = dw.get("bias")
    projs = []
    for i in range(3):
        sl = slice(i * c, (i + 1) * c)
        projs.append(dict(w1=w1[:, sl], wd=wd[:, :, sl],
                          b1=None if b1 is None else b1[sl],
                          bd=None if bd is None else bd[sl]))
    from turtlevsr_tpu.kernels.vjp import call_qkv_stats

    v_map, g, s = call_qkv_stats(
        x, projs, ln_w=ln[0] if ln else None,
        ln_b=(ln[1] if ln else None), interpret=_pallas_interpret())

    ad = acc_dtype(x.dtype)
    eps = jnp.asarray(1e-12, ad)
    nq = jnp.maximum(_safe_norm(s[:, 0, :c].astype(ad)),
                     eps).reshape(b, heads, ctok)
    nk = jnp.maximum(_safe_norm(s[:, 0, c:].astype(ad)),
                     eps).reshape(b, heads, ctok)
    ghh = jnp.stack([g[:, i * ctok:(i + 1) * ctok, i * ctok:(i + 1) * ctok]
                     for i in range(heads)], axis=1).astype(ad)
    scores = ghh / (nq[..., None] * nk[..., None, :])
    temp = params["temperature"].astype(ad)[None]  # (1, heads, 1, 1)
    attn = masked_softmax(scores * temp, None).astype(x.dtype)

    wpo = params["project_out"]["weight"].reshape(c, c)
    # fp32 operands: numerically identical (bf16 products are exact in
    # fp32, accumulation is fp32 either way), the product is tiny, and the
    # CPU backend's DotThunk has no bf16 support for this batched form
    # (tests/app run the model on CPU)
    po_w = jnp.einsum("bhcd,hce->bhde", attn.astype(ad),
                      wpo.reshape(heads, ctok, c).astype(ad),
                      preferred_element_type=ad)
    po_w = po_w.reshape(b, c, c).astype(x.dtype)
    return v_map, po_w, params["project_out"].get("bias")


def fhr_apply(params, x, heads: int, slot: Optional[dict], ln=None,
              spec=None, skip_po=False):
    """Standalone FHR with its ring-buffer slot (latent blocks)."""
    if slot is not None:
        ctok = x.shape[-1] // heads
        n_frames = slot["k"].shape[2] // ctok
        hist_valid = token_valid_mask(slot["n"], n_frames, ctok)
        out, k, v = _fhr_attend(params, x, heads, slot["k"], slot["v"],
                                hist_valid, ln=ln, spec=spec,
                                skip_po=skip_po)
        new_slot = fhr_slot_append(slot, k, v)
    else:
        out, k, v = _fhr_attend(params, x, heads, ln=ln, spec=spec,
                                skip_po=skip_po)
        new_slot = None
    return out, new_slot


# ---------------------------------------------------------------------------
# StateAlignBlock (SAB) — windowed cross-frame alignment attention
# ---------------------------------------------------------------------------
#
# NOTE the reference's einops pattern '(p1 h)' puts the "window" factor p1
# OUTERMOST: token (h, w) gathers the ws² pixels {(p1*H + h, p2*W + w)} — a
# strided lattice over the whole image, not a contiguous window
# (turtle_arch.py:487-492). Checkpoints bake this in; we reproduce it.


def _lattice_split(x, ws: int, spec=None):
    """(B,h,w,c) -> (B, H*W, ws*ws*c) with H=h//ws, feature order (p1,p2,c).

    With kernels == 'pallas' and c % 128 == 0 (dec2/dec3 widths) the
    permutation runs as a Pallas block-copy grid at HBM bandwidth
    (kernels/lattice.py); XLA's 6-D transpose otherwise (at c=64 the
    64-lane copy grain rules the kernel out — see lattice.py docstring)."""
    b, h, w, c = x.shape
    if spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.lattice import (lattice_split_op,
                                                   lattice_supported)

        if lattice_supported(h, w, c, ws):
            return lattice_split_op(x, ws, _pallas_interpret())
    hh, ww = h // ws, w // ws
    t = x.reshape(b, ws, hh, ws, ww, c).transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(b, hh * ww, ws * ws * c)


def _lattice_merge(t, ws: int, h: int, w: int, spec=None):
    b, hw, d = t.shape
    hh, ww = h // ws, w // ws
    c = d // (ws * ws)
    if spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.lattice import (lattice_merge_op,
                                                   lattice_supported)

        if lattice_supported(h, w, c, ws):
            return lattice_merge_op(t, ws, h, w, _pallas_interpret())
    x = t.reshape(b, hh, ww, ws, ws, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, c)


def sab_init(key, dim: int, bias: bool, window_size: int,
             dtype=jnp.float32) -> dict:
    """StateAlignBlock params (turtle_t1_arch.py:290-310). num_heads is fixed
    to 1 in the reference; temperature is a scalar (1,1,1)."""
    ks = jax.random.split(key, 9)
    return {
        "temperature": jnp.ones((1, 1, 1), dtype),
        "qk": conv_init(ks[0], dim, dim * 2, 1, bias=bias, dtype=dtype),
        "qk_dwconv": conv_init(ks[1], dim * 2, dim * 2, 3, groups=dim * 2,
                               bias=bias, dtype=dtype),
        "v": conv_init(ks[2], dim, dim, 1, bias=bias, dtype=dtype),
        "v_dwconv": conv_init(ks[3], dim, dim, 3, groups=dim, bias=bias,
                              dtype=dtype),
        # q2/k2 exist in both variants' state_dicts but are only USED by the
        # t1 forward (turtle_t1_arch.py:559-560); t0 keeps them as dead
        # parameters (its active forward never calls them).
        "k2": conv_init(ks[4], dim, dim * 2, 1, bias=bias, dtype=dtype),
        "k2_dwconv": conv_init(ks[5], dim * 2, dim * 2, window_size,
                               groups=dim * 2, bias=bias, dtype=dtype),
        "q2": conv_init(ks[6], dim, dim * 2, 1, bias=bias, dtype=dtype),
        "q2_dwconv": conv_init(ks[7], dim * 2, dim * 2, window_size,
                               groups=dim * 2, bias=bias, dtype=dtype),
        "project_out": conv_init(ks[8], dim, dim, 1, bias=bias, dtype=dtype),
    }


def _sab_finish(params, out_tok, fvalid, ws: int, h: int, w: int,
                projected: bool = False, spec=None, masked: bool = False):
    """Un-lattice each aligned frame, project (unless the v tokens were
    pre-projected), zero invalid frames. ``masked=True`` means the
    validity zeroing already happened upstream (the fused softmax kernel
    folds fvalid into the attention rows, so invalid frames' @v outputs
    are exactly zero) — legal only when no post-merge bias can un-zero
    them (the pre-projected, bias-free configs)."""
    b, nf, hw, d = out_tok.shape
    maps = _lattice_merge(out_tok.reshape(b * nf, hw, d), ws, h, w,
                          spec=spec)
    if not projected:
        maps = _conv(params["project_out"], maps)
    c = maps.shape[-1]
    maps = maps.reshape(b, nf, h, w, c)
    if masked:
        return maps
    return maps * fvalid.astype(maps.dtype)[None, :, None, None, None]


def sab_t1_apply(params, x, ws: int, slot: Optional[dict], ln=None,
                 spec=None, pre=None, per_frame=False):
    """t1 semantics (the LAST forward def wins — turtle_t1_arch.py:548-610):
    q,k re-projected through stride-ws depthwise convs into per-window tokens
    of dim 2c; v is lattice-windowed raw; sparsity = top-5 + L1<=4 local mask
    combined as attn1 + attn2 then clipped_softmax; attention output USED.

    Returns (aligned frames (B, NF, h, w, c), frame_valid (NF,), new_slot).

    per_frame=True (request; honoured only for the bias-free pre-projected
    configs) returns the aligned frames as a LIST of NF (B, h, w, c) maps
    instead: the @v contraction runs as per-frame dots on zero-copy ring
    slices, fvalid folds into each dot's output (XLA fuses the scalar mul),
    and the (B, NF, HW, ws*ws*c) v_all concat + stacked out_tok + stacked
    mask pass never materialise (~1.2 GB HBM/frame at 720p). Exact: the
    merge is a permutation and the dots are the batched einsum's slices.
    """
    b, h, w, c = x.shape
    # project_out is a bias-free 1x1 in the shipped configs, so it commutes
    # with the attention's weighted sum over window tokens: applying it to
    # the ONE current v map (and caching projected tokens) replaces NF
    # per-frame output projections in _sab_finish.
    pre_project = "bias" not in params["project_out"]
    # ... and being bias-free end to end, the whole v chain composes into
    # ONE dense 3x3 conv: po o dw3x3 o pw1x1 = conv3x3 with
    # K[t] = w_v diag(wd_v[t]) w_po — one kernel pass over x, the
    # unprojected v map and the separate po matmul never exist.
    v_po = False
    if (pre is None and pre_project and spec is not None
            and spec.kernels == "pallas"
            and "bias" not in params["v"]
            and "bias" not in params["v_dwconv"]):
        from turtlevsr_tpu.kernels.ffn import conv3x3_pallas_supported

        v_po = conv3x3_pallas_supported(h, w, c, c)
    if pre is not None:  # projections already computed (merged CHM call)
        q_, k_, v_map = pre
    elif v_po:
        from turtlevsr_tpu.kernels.vjp import conv3_op

        q_, k_ = _multi_proj_dw(params, [("qk", "qk_dwconv", 2)], x, ln,
                                spec)
        ad = acc_dtype(x.dtype)
        K = jnp.einsum(
            "im,tsm,mo->tsio",
            params["v"]["weight"][0, 0].astype(ad),
            params["v_dwconv"]["weight"][:, :, 0].astype(ad),
            params["project_out"]["weight"][0, 0].astype(ad)).astype(x.dtype)
        p3 = {"weight": K}
        if ln is not None:
            p3["ln_w"] = ln[0]
            if ln[1] is not None:
                p3["ln_b"] = ln[1]
        v_map = conv3_op(x, p3, _pallas_interpret())
    else:
        q_, k_, v_map = _multi_proj_dw(
            params, [("qk", "qk_dwconv", 2), ("v", "v_dwconv", 1)], x, ln,
            spec)
    if pre_project and not v_po:
        v_map = _conv(params["project_out"], v_map)

    # window-strided depthwise projections: kernel=stride=ws, padding=1
    # (turtle_t1_arch.py:306-308); bias-free configs take the folded
    # patchify contraction (one pass, no intermediate 2c map)
    if ("bias" not in params["k2"] and "bias" not in params["k2_dwconv"]
            and "bias" not in params["q2"] and "bias" not in params["q2_dwconv"]):
        k2 = _strided_patch_proj(params["k2"], params["k2_dwconv"], k_, ws)
        q2 = _strided_patch_proj(params["q2"], params["q2_dwconv"], q_, ws)
    else:
        k2 = _conv(params["k2_dwconv"], _conv(params["k2"], k_), stride=ws,
                   padding=1)
        q2 = _conv(params["q2_dwconv"], _conv(params["q2"], q_), stride=ws,
                   padding=1)
    hq, wq = q2.shape[1], q2.shape[2]
    assert hq == h // ws and wq == w // ws, (
        f"SAB window grid mismatch: conv gives {hq}x{wq}, lattice needs "
        f"{h // ws}x{w // ws} (h={h}, w={w}, ws={ws})")

    q = l2_normalize(q2.reshape(b, hq * wq, 2 * c), axis=-1)
    k = l2_normalize(k2.reshape(b, hq * wq, 2 * c), axis=-1)
    v = _lattice_split(v_map, ws, spec=spec)  # (B, HW, ws*ws*c)

    take_pf = per_frame and pre_project
    if slot is not None:
        n_frames = slot["k"].shape[1]
        k_all = jnp.concatenate([slot["k"].astype(k.dtype), k[:, None]], axis=1)
        # per-frame mode reads the ring slices directly in the @v dots —
        # the (B, NF, HW, ws*ws*c) concat copy never exists
        v_frames = ([slot["v"][:, i].astype(v.dtype) for i in range(n_frames)]
                    + [v]) if take_pf else None
        v_all = (None if take_pf else
                 jnp.concatenate([slot["v"].astype(v.dtype), v[:, None]],
                                 axis=1))
        fvalid = jnp.concatenate(
            [frame_valid_mask(slot["n"], n_frames), jnp.ones((1,), bool)])
        new_slot = sab_slot_append(slot, k, v)
    else:
        k_all = k[:, None]
        v_frames = [v] if take_pf else None
        v_all = None if take_pf else v[:, None]
        fvalid = jnp.ones((1,), bool)
        new_slot = None

    ad = acc_dtype(x.dtype)
    temp = params["temperature"].astype(ad).reshape(())
    hw = q.shape[1]
    lm = local_window_mask(hq, wq, 4, x.dtype)
    use_fused = False
    if spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.sab import sab_sparse_softmax_supported

        use_fused = sab_sparse_softmax_supported(hw, hw)
    if use_fused:
        # scores + top-5 + local mask + clipped softmax in ONE fused Pallas
        # pass; the (NF, HW, HW) score tensor never round-trips HBM
        from turtlevsr_tpu.kernels.vjp import sab_attn_probs_op

        kt = k_all.transpose(0, 1, 3, 2)  # (B, NF, D, HW)
        a = sab_attn_probs_op(q, kt, lm, temp, fvalid.astype(jnp.float32),
                              (_pallas_interpret(), wq))
    else:
        attn = jnp.einsum("bqd,bnkd->bnqk", q, k_all,
                          preferred_element_type=ad) * temp
        attn = attn.astype(x.dtype)
        attn1 = topk_keep(attn, 5)
        attn2 = attn * lm[None, None]
        a = clipped_softmax(attn1 + attn2)  # (B, NF, HW, HW)

    if _SAB_PROBS_TAP is not None:
        # debug instrument (tools/sab_sparsity.py): stream the attention
        # probabilities to the host collector; measurement-only, never set
        # in production
        jax.debug.callback(_sab_probs_sink, a, wq)

    if take_pf:
        # per-frame @v: one dot per frame over the zero-copy ring slice;
        # fvalid folds into the dot output (fused scalar mul — zeroed
        # invalid frames commute with the projected-v merge permutation)
        fv = fvalid.astype(ad)
        maps = []
        for i in range(len(v_frames)):
            vi = v_frames[i]
            ti = jnp.einsum("bqk,bkd->bqd", a[:, i].astype(vi.dtype), vi,
                            preferred_element_type=ad)
            ti = (ti * fv[i]).astype(x.dtype)
            maps.append(_lattice_merge(ti, ws, h, w, spec=spec))
        return maps, fvalid, new_slot

    nf = v_all.shape[1]
    dv = v_all.shape[-1]
    c = dv // (ws * ws)
    # Slot-tiled @v + coarse merge (kernels/sab.py sab_attn_v_merge):
    # measured SLOWER than the dense einsum + XLA 6-D merge at every level
    # (dec1 15.8 vs 13.9 ms, dec2 7.4 vs 6.6, dec3 4.1 vs 3.7 — the
    # N=c_slot matmul tiling loses more MXU efficiency than the coarse
    # merge transpose recovers, and v re-streams once per q-chunk). The
    # kernel stays tested (test_kernels_bench_shapes) as the measured
    # negative; r2-verdict item 2 closed by measurement.
    use_av = False
    if use_av and spec is not None and spec.kernels == "pallas":
        from turtlevsr_tpu.kernels.sab import sab_av_slots_supported

        use_av = sab_av_slots_supported(hw, dv, c)
    if use_av:
        # slot-tiled @v whose output layout turns the lattice merge into a
        # coarse-grained transpose (kernels/sab.py sab_attn_v_merge)
        from turtlevsr_tpu.kernels.vjp import sab_av_merge_op

        maps = sab_av_merge_op(a.reshape(b * nf, hw, hw).astype(v_all.dtype),
                               v_all.reshape(b * nf, hw, dv),
                               (ws, h, w, _pallas_interpret()))
        if not pre_project:
            maps = _conv(params["project_out"], maps)
        maps = maps.reshape(b, nf, h, w, maps.shape[-1])
        return (maps * fvalid.astype(maps.dtype)[None, :, None, None, None],
                fvalid, new_slot)
    out_tok = jnp.einsum("bnqk,bnkd->bnqd", a.astype(v_all.dtype), v_all,
                         preferred_element_type=ad).astype(x.dtype)
    return (_sab_finish(params, out_tok, fvalid, ws, h, w,
                        projected=pre_project, spec=spec,
                        masked=use_fused and pre_project),
            fvalid, new_slot)


def sab_t0_apply(params, x, ws: int, slot: Optional[dict], ln=None,
                 spec=None, pre=None):
    """t0 semantics (turtle_arch.py:459-533). The attention scores are
    computed and then DISCARDED by ``out = v`` (:523, SURVEY.md quirk Q1), so
    the aligned output is just the lattice-windowed V of [history ‖ current]
    and the whole q/top-k/softmax chain is dead code — we skip it. The
    windowed-K cache would only feed the NEXT frame's equally-dead
    attention, so the entire qk chain (posenc add, qk 1x1 + dwconv,
    l2-normalise, lattice split) and the K ring writes are skipped too;
    the slot keeps a tiny zero K field for pytree-structure stability
    (see core/cache.py sab_slot_append_v)."""
    b, h, w, c = x.shape
    if ln is not None:
        x = layer_norm(x, ln[0], ln[1])
    # out = v here (quirk Q1), so project_out applies per frame to the raw
    # windowed v -- pre-projecting the one current map is exact (bias incl.)
    v_po = False
    if (spec is not None and spec.kernels == "pallas"
            and all("bias" not in params[n]
                    for n in ("v", "v_dwconv", "project_out"))):
        from turtlevsr_tpu.kernels.ffn import conv3x3_pallas_supported

        v_po = conv3x3_pallas_supported(h, w, c, c)
    if v_po:
        # bias-free: the whole v chain composes into ONE dense 3x3 conv
        # (same fold as sab_t1_apply; x is already LayerNormed here)
        from turtlevsr_tpu.kernels.vjp import conv3_op

        ad = acc_dtype(x.dtype)
        K = jnp.einsum(
            "im,tsm,mo->tsio",
            params["v"]["weight"][0, 0].astype(ad),
            params["v_dwconv"]["weight"][:, :, 0].astype(ad),
            params["project_out"]["weight"][0, 0].astype(ad)).astype(x.dtype)
        v_map = conv3_op(x, {"weight": K}, _pallas_interpret())
    else:
        v_map = _proj_dw(params, ("v", "v_dwconv"), x, None, spec)
        v_map = _conv(params["project_out"], v_map)

    v = _lattice_split(v_map, ws, spec=spec)

    if slot is not None:
        n_frames = slot["v"].shape[1]
        v_all = jnp.concatenate([slot["v"].astype(v.dtype), v[:, None]], axis=1)
        fvalid = jnp.concatenate(
            [frame_valid_mask(slot["n"], n_frames), jnp.ones((1,), bool)])
        new_slot = sab_slot_append_v(slot, v)
    else:
        v_all = v[:, None]
        fvalid = jnp.ones((1,), bool)
        new_slot = None

    return (_sab_finish(params, v_all, fvalid, ws, h, w, projected=True,
                        spec=spec), fvalid, new_slot)


# ---------------------------------------------------------------------------
# CausalHistoryModel (CHM) = SAB alignment + FHR routing
# ---------------------------------------------------------------------------


def chm_init(key, dim: int, heads: int, bias: bool, window_size: int,
             dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "spatial_aligner": sab_init(k1, dim, bias, window_size, dtype=dtype),
        "ChanAttn": fhr_init(k2, dim, heads, bias, dtype=dtype),
        "kv": conv_init(k3, dim, dim * 2, 1, bias=bias, dtype=dtype),
        "kv_dwconv": conv_init(k4, dim * 2, dim * 2, 3, groups=dim * 2,
                               bias=bias, dtype=dtype),
    }


def _strided_patch_proj(pw, dw, x, ws: int):
    """pw1x1 (c->e) then depthwise conv kernel=stride=ws, padding=1 — the
    SAB q2/k2 window embedding (turtle_t1_arch.py:306-308) — folded into ONE
    patchify contraction.

    With stride == kernel the windows tile the padded image exactly, so
    out[i,j,e] = sum_{h,w,c} x[i*ws+h-1, j*ws+w-1, c] * (W1[c,e]*wd[h,w,e]).
    XLA runs the window reshape + dot at ~1.7x the speed of the 1x1+strided
    -dwconv chain AND never materialises the (H, W, e) intermediate map
    (measured 736x1280 c=64: 2.96 -> 1.70 ms; 368x640: 1.61 -> 0.63).
    Bias-free only (the shipped configs); callers fall back otherwise."""
    b, h, w, c = x.shape
    e = pw["weight"].shape[-1]
    k = pw["weight"][0, 0][:, None, None, :] * dw["weight"][:, :, 0][None]
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))[:, :h, :w]
    hh, ww = h // ws, w // ws
    xw = xp.reshape(b, hh, ws, ww, ws, c)
    ad = acc_dtype(x.dtype)
    return jnp.einsum("bihjwc,chwe->bije", xw, k,
                      preferred_element_type=ad).astype(x.dtype)


def _safe_norm(ss):
    """sqrt(ss) with zero rows mapped to 0 and finite gradients."""
    nonzero = ss > 0
    n = jnp.sqrt(jnp.where(nonzero, ss, 1.0))
    return jnp.where(nonzero, n, 0.0)


def _chm_stats_ok(params, x, spec, nf: int) -> bool:
    """Shape/bias gate for the fused CHM-stats kernel path."""
    if spec is None or spec.kernels != "pallas":
        return False
    from turtlevsr_tpu.kernels.ffn import chm_stats_supported

    b, h, w, c = x.shape
    ca = params["ChanAttn"]
    bias_free = all(
        "bias" not in d for d in (params["kv"], params["kv_dwconv"],
                                  ca["qkv"], ca["qkv_dwconv"]))
    return bias_free and chm_stats_supported(h, w, c, nf)


def chm_av_in_ffn_supported(params, x, spec, slot, e_half: int) -> bool:
    """Gate for folding CHM's attention apply + project_out into the FFN
    kernel as nf+1 pair-input maps with composed per-frame attn@W_po
    matrices (saves ~5 full-map traversals per CHM block: the v/vh reads
    by the XLA apply einsums, the attention-output write+read, and the
    project_out pass). Requires the stats kernel (maps already on HBM in
    the right layout) and a feasible FFN strip with nf+1 pair streams.
    e_half: the GFFW per-gate-half hidden width."""
    import os

    if os.environ.get("TURTLE_CHM_IN_FFN", "1") == "0":
        return False
    nf = (slot["k"].shape[1] if slot is not None else 0) + 1
    if not _chm_stats_ok(params, x, spec, nf):
        return False
    from turtlevsr_tpu.kernels.ffn import ffn_pallas_supported

    b, h, w, c = x.shape
    return ffn_pallas_supported(h, w, c, e_half, True, has_pair=nf + 1)


def chm_apply(params, x, heads: int, ws: int, variant: str,
              slot: Optional[dict], ln=None, spec=None, skip_po=False,
              return_av: bool = False):
    """turtle_arch.py:535-585: aligned = SAB(x, cache); K,V embeddings of all
    aligned frames (frame-major channel tokens); FHR cross-attends the
    current frame over them. The returned cache is SAB's.

    TPU note: everything stays in NHWC map layout — the Gram matrices are
    contracted directly with the frame axis riding along, and normalised by
    per-token norms afterwards (same math as l2-normalise-then-matmul, no
    transposed full-map copies)."""
    b, h, w, c = x.shape
    l = h * w
    ctok = c // heads

    # note: merging SAB's qk/v and ChanAttn's qkv into one 6c fused call
    # was tried and measured SLOWER (the larger hidden width shrinks the
    # kernel's row strips); separate calls win
    sab_pre = qkv_pre = None
    nf_pre = (slot["k"].shape[1] if slot is not None else 0) + 1
    use_stats = _chm_stats_ok(params, x, spec, nf_pre)
    if variant == "t0":
        x_sp, fvalid, new_slot = sab_t0_apply(
            params["spatial_aligner"], x, ws, slot, ln=ln, spec=spec,
            pre=sab_pre)
    else:
        # the stats kernel streams the aligned frames with frame-indexed
        # block specs, so it can take them as a per-frame LIST: SAB's
        # per-frame mode (no v_all concat / stacked-maps copies). Ledger
        # win but measured ~1.2 ms SLOWER on chip (2026-08-19 A/B:
        # 5.213 on vs 5.245 off — the concat traffic wasn't binding);
        # default OFF, TURTLE_SAB_PERFRAME=1 re-enables for A/B.
        pf = use_stats and _os.environ.get("TURTLE_SAB_PERFRAME", "0") == "1"
        x_sp, fvalid, new_slot = sab_t1_apply(
            params["spatial_aligner"], x, ws, slot, ln=ln, spec=spec,
            pre=sab_pre, per_frame=pf)
    nf = len(x_sp) if isinstance(x_sp, (list, tuple)) else x_sp.shape[1]
    assert nf == nf_pre

    ad = acc_dtype(x.dtype)
    eps = jnp.asarray(1e-12, ad)
    ca = params["ChanAttn"]

    if use_stats:
        # ONE pass over x + the NF aligned maps (kernels/ffn.py
        # fused_chm_stats): q, k and every kh map stay in VMEM; only the
        # v/vh value maps and the fp32 gram/norm statistics come back
        from turtlevsr_tpu.kernels.vjp import call_chm_stats

        ch3 = ca["qkv"]["weight"].reshape(c, 3 * c)
        wd3 = ca["qkv_dwconv"]["weight"].reshape(3, 3, 3 * c)
        qkv_projs = [dict(w1=ch3[:, i * c:(i + 1) * c],
                          wd=wd3[:, :, i * c:(i + 1) * c]) for i in range(3)]
        ch2 = params["kv"]["weight"].reshape(c, 2 * c)
        wd2 = params["kv_dwconv"]["weight"].reshape(3, 3, 2 * c)
        kv_projs = [dict(w1=ch2[:, i * c:(i + 1) * c],
                         wd=wd2[:, :, i * c:(i + 1) * c]) for i in range(2)]
        v3, vh_map, g_full, gh_full, srow = call_chm_stats(
            x, x_sp, qkv_projs, kv_projs,
            ln_w=ln[0] if ln else None, ln_b=(ln[1] if ln else None),
            interpret=_pallas_interpret())
        vh = vh_map.reshape(b, nf, l, heads, ctok)
        v = v3.reshape(b, l, heads, ctok)
        nq = jnp.maximum(_safe_norm(srow[:, 0, 0].astype(ad)),
                         eps).reshape(b, heads, ctok)
        nk = jnp.maximum(_safe_norm(srow[:, 1, 0].astype(ad)),
                         eps).reshape(b, heads, ctok)
        nk_h = jnp.maximum(_safe_norm(srow[:, 2:, 0].astype(ad)),
                           eps).reshape(b, nf, heads, ctok)
        ghb = jnp.stack(
            [gh_full[:, :, i * ctok:(i + 1) * ctok, i * ctok:(i + 1) * ctok]
             for i in range(heads)], axis=1).astype(ad)
        gh = ghb.transpose(0, 1, 3, 2, 4)  # (B, heads, ctok, NF, ctok)
        gh = gh / (nq[:, :, :, None, None]
                   * nk_h.transpose(0, 2, 1, 3)[:, :, None])
        gh = gh.reshape(b, heads, ctok, nf * ctok)
        g = jnp.stack(
            [g_full[:, i * ctok:(i + 1) * ctok, i * ctok:(i + 1) * ctok]
             for i in range(heads)], axis=1).astype(ad)
        g = g / (nq[:, :, :, None] * nk[:, :, None, :])
    else:
        xs = x_sp.reshape(b * nf, h, w, c)
        km, vm = _multi_proj_dw(params, [("kv", "kv_dwconv", 2)], xs, None,
                                spec)
        kh = km.reshape(b, nf, l, heads, ctok)  # (B, NF, L, heads, ctok)
        vh = vm.reshape(b, nf, l, heads, ctok)

        nk_h = jnp.maximum(_safe_norm(
            jnp.einsum("bnlhc,bnlhc->bnhc", kh, kh,
                       preferred_element_type=ad)), eps)

        # FHR projections of the current frame (ChanAttn,
        # turtle_arch.py:583)
        q, k, v = (qkv_pre if qkv_pre is not None else _multi_proj_dw(
            ca, [("qkv", "qkv_dwconv", 3)], x, ln, spec))
        q = q.reshape(b, l, heads, ctok)
        k = k.reshape(b, l, heads, ctok)
        v = v.reshape(b, l, heads, ctok)

        def norms(t):
            return jnp.maximum(_safe_norm(
                jnp.einsum("blhc,blhc->bhc", t, t,
                           preferred_element_type=ad)), eps)

        nq, nk = norms(q), norms(k)

        gh = jnp.einsum("blhc,bnlhd->bhcnd", q, kh,
                        preferred_element_type=ad)
        gh = gh / (nq[:, :, :, None, None]
                   * nk_h.transpose(0, 2, 1, 3)[:, :, None])
        gh = gh.reshape(b, heads, ctok, nf * ctok)  # frame-major order
        g = jnp.einsum("blhc,blhd->bhcd", q, k, preferred_element_type=ad)
        g = g / (nq[:, :, :, None] * nk[:, :, None, :])

    scores = jnp.concatenate([gh, g], axis=-1)
    valid = jnp.concatenate(
        [jnp.repeat(fvalid, ctok), jnp.ones((ctok,), bool)])[None, None,
                                                             None, :]
    temp = ca["temperature"].astype(ad)[None]
    attn = masked_softmax(scores * temp, valid).astype(x.dtype)

    a_h = attn[..., :nf * ctok].reshape(b, heads, ctok, nf, ctok)
    a_c = attn[..., nf * ctok:]

    if return_av:
        assert use_stats, "return_av requires the stats-kernel path (gate)"
        # Fold the attention apply + project_out into the consumer FFN
        # kernel: out2 = sum_n vh_n @ P_n + v @ P_c with
        #   P_n[(h,d),z] = sum_c' a_h[h,c',n,d] * Wpo[(h,c'),z]
        #   P_c[(h,d),z] = sum_d' a_c[h,c',d]  * Wpo[(h,c'),z]
        # — the per-head block-diagonal attention composed with the 1x1
        # project_out, exactly the channel-attention po' trick extended to
        # the nf history maps. Caller feeds (maps, P list) to the FFN
        # kernel's multi pair-input; the attention output map, its
        # projection and the residual sum never hit HBM. Gated by
        # chm_av_in_ffn_supported (requires use_stats, so vh_map/v3 exist
        # on HBM in map layout already). fp32 operands: non-canonical bf16
        # dots crash the CPU DotThunk (CLAUDE.md).
        wpoR = ca["project_out"]["weight"][0, 0].astype(ad).reshape(
            heads, ctok, c)
        pn = jnp.einsum("bhcnd,hcz->bnhdz", a_h.astype(ad), wpoR,
                        preferred_element_type=ad)
        pn = pn.reshape(b, nf, c, c).astype(x.dtype)
        pc = jnp.einsum("bhcd,hcz->bhdz", a_c.astype(ad), wpoR,
                        preferred_element_type=ad)
        pc = pc.reshape(b, c, c).astype(x.dtype)
        # the stacked vh buffer goes in AS-IS (5-D): the kernel's block
        # specs index the frame dim directly, no per-frame slice copies
        maps = [vh_map.reshape(b, nf, h, w, c), v3.reshape(b, h, w, c)]
        pos = [pn[:, n] for n in range(nf)] + [pc]
        return (maps, pos, ca["project_out"].get("bias")), new_slot

    out = jnp.einsum("bhcnd,bnlhd->blhc", a_h, vh, preferred_element_type=ad)
    out = out + jnp.einsum("bhcd,blhd->blhc", a_c, v,
                           preferred_element_type=ad)
    out = out.astype(x.dtype).reshape(b, h, w, c)
    if not skip_po:  # else project_out fuses into the FFN kernel
        out = _conv(ca["project_out"], out)
    return out, new_slot


# ---------------------------------------------------------------------------
# Transformer block / level assemblies
# ---------------------------------------------------------------------------


def attn_block_init(key, spec: BlockSpec, dtype=jnp.float32) -> dict:
    """TurtleAttnBlock (turtle_arch.py:669-734)."""
    k_attn, k_ffn, k_n1, k_n2 = jax.random.split(key, 4)
    params = {
        "norm1": {"body": layer_norm_init(spec.dim, spec.layernorm_bias, dtype)},
        "norm2": {"body": layer_norm_init(spec.dim, spec.layernorm_bias, dtype)},
    }
    t = spec.attn_type
    if t == "Channel":
        params["attn"] = channel_attention_init(k_attn, spec.dim,
                                                spec.num_heads, spec.bias,
                                                dtype)
    elif t == "ReducedAttn":
        params["attn"] = reduced_attn_init(k_attn, spec.dim, dtype=dtype)
    elif t == "FHR":
        params["attn"] = fhr_init(k_attn, spec.dim, spec.num_heads, spec.bias,
                                  dtype)
    elif t == "CHM":
        params["attn"] = chm_init(k_attn, spec.dim, spec.num_heads, spec.bias,
                                  spec.window_size, dtype)
    elif t == "NoAttn":
        pass
    else:
        raise ValueError(f"unknown attention type {t!r}")

    if spec.ffw_type == "GFFW":
        params["ffn"] = gffw_init(k_ffn, spec.dim, spec.ffn_expansion_factor,
                                  spec.bias, dtype)
    elif spec.ffw_type == "FFW":
        params["ffn"] = ffw_init(k_ffn, spec.dim, dtype)
    else:
        raise ValueError(f"unknown FFW type {spec.ffw_type!r}")
    return params


def _ln(params, x):
    return layer_norm(x, params["body"]["weight"], params["body"].get("bias"))


def _pallas_interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"


def _ffn_half_supported(params, x, spec: BlockSpec) -> bool:
    """Shape gate for the fused FFN/ReducedAttn halves (the kernels need
    W % 8 == 0 and a feasible VMEM strip; small val/tile shapes fall back
    to the XLA chain)."""
    from turtlevsr_tpu.kernels.ffn import ffn_pallas_supported

    h, w, c = x.shape[1], x.shape[2], spec.dim
    if spec.attn_type == "ReducedAttn":
        dw = params["attn"]["conv1"]["weight"].shape[-1]
        if not ffn_pallas_supported(h, w, c, dw, True):
            return False
    if spec.ffw_type == "GFFW":
        hid = params["ffn"]["project_in"]["weight"].shape[-1]
        # attention blocks stream their branch in as the kernel's pair
        # input (x2), which costs extra VMEM — account for it in the gate
        has_pair = spec.attn_type not in ("NoAttn", "ReducedAttn")
        return ffn_pallas_supported(h, w, c, hid // 2, True,
                                    has_pair=has_pair)
    return ffn_pallas_supported(h, w, c, 2 * c, False)


def _fused_ffn_half(params, x, spec: BlockSpec, x2=None, po=None):
    """(x [+ po(x2)]) + FFN(norm2(x [+ po(x2)])) as one fused Pallas pass
    (kernels/ffn.py), differentiable via kernels/vjp.py. ``x2`` is the
    attention branch (pre-projection when ``po`` — its project_out conv —
    is given): both the projected map and the residual sum stay in VMEM
    (dw/GFFW path only)."""
    from turtlevsr_tpu.kernels.vjp import call_fused_ffn as fused_block_ffn

    ln = params["norm2"]["body"]
    p = params["ffn"]
    c = spec.dim
    if spec.ffw_type == "GFFW":
        hid = p["project_in"]["weight"].shape[-1]
        po_w = None
        if po is not None:  # conv params (1,1,C,C), a precomputed matrix,
            # or a LIST of per-map matrices (CHM's composed attn@W_po)
            pw = po["weight"]
            if isinstance(pw, (list, tuple)):
                po_w = list(pw)
            else:
                po_w = pw.reshape(c, c) if pw.ndim == 4 else pw
        return fused_block_ffn(
            x, x2=x2,
            po_w=po_w,
            po_b=None if po is None else po.get("bias"),
            ln_w=ln["weight"], ln_b=ln.get("bias"),
            w1=p["project_in"]["weight"].reshape(c, hid),
            b1=p["project_in"].get("bias"),
            wd=p["dwconv"]["weight"].reshape(3, 3, hid),
            bd=p["dwconv"].get("bias"),
            w2=p["project_out"]["weight"].reshape(hid // 2, c),
            b2=p["project_out"].get("bias"),
            mode="gate", interpret=_pallas_interpret())
    if x2 is not None:  # FFW (no-dw) path has no pair input
        if po is not None:
            x2 = _conv(po, x2)
        x = x + x2
    return fused_block_ffn(
        x, ln_w=ln["weight"], ln_b=ln.get("bias"),
        w1=p["conv4"]["weight"].reshape(c, 2 * c), b1=p["conv4"]["bias"],
        w2=p["conv5"]["weight"].reshape(2 * c, c), b2=p["conv5"]["bias"],
        scale=p["gamma"], mode="gelu", interpret=_pallas_interpret())


def _fused_reduced_attn_half(params, x, spec: BlockSpec, chain_ffw=False):
    """x + ReducedAttn(norm1(x)) as one fused Pallas pass
    (differentiable). With chain_ffw the block's pointwise FFW half is
    appended IN the same kernel (one traversal for the whole
    ReducedAttn+FFW block — turtle_arch.py:627-665 + :184-213)."""
    from turtlevsr_tpu.kernels.vjp import call_fused_ffn as fused_block_ffn

    ln = params["norm1"]["body"]
    p = params["attn"]
    c = spec.dim
    dw = p["conv1"]["weight"].shape[-1]
    ffw2 = None
    if chain_ffw:
        ln2 = params["norm2"]["body"]
        pf = params["ffn"]
        ffw2 = {"ln_w": ln2["weight"],
                "w1": pf["conv4"]["weight"].reshape(c, 2 * c),
                "b1": pf["conv4"]["bias"],
                "w2": pf["conv5"]["weight"].reshape(2 * c, c),
                "b2": pf["conv5"]["bias"], "scale": pf["gamma"]}
        if ln2.get("bias") is not None:
            ffw2["ln_b"] = ln2["bias"]
    return fused_block_ffn(
        x, ln_w=ln["weight"], ln_b=ln.get("bias"),
        w1=p["conv1"]["weight"].reshape(c, dw), b1=p["conv1"]["bias"],
        wd=p["conv2"]["weight"].reshape(3, 3, dw), bd=p["conv2"]["bias"],
        w2=p["conv3"]["weight"].reshape(dw, c), b2=p["conv3"]["bias"],
        scale=p["beta"], mode="gelu", ffw2=ffw2,
        interpret=_pallas_interpret())


def _ra_stage_dict(params):
    """ReducedAttn half as a chain2 stage dict."""
    ln = params["norm1"]["body"]
    a = params["attn"]
    cw = a["conv1"]["weight"]
    c, dw = cw.shape[2], cw.shape[3]
    return {"ln_w": ln["weight"], "ln_b": ln.get("bias"), "mode": "gelu",
            "w1": cw.reshape(c, dw), "b1": a["conv1"]["bias"],
            "wd": a["conv2"]["weight"].reshape(3, 3, dw),
            "bd": a["conv2"]["bias"],
            "w2": a["conv3"]["weight"].reshape(dw, c),
            "b2": a["conv3"]["bias"], "scale": a["beta"]}


def _ffw_dict(params):
    ln = params["norm2"]["body"]
    f = params["ffn"]
    c = f["conv4"]["weight"].shape[2]
    return {"ln_w": ln["weight"], "ln_b": ln.get("bias"),
            "w1": f["conv4"]["weight"].reshape(c, 2 * c),
            "b1": f["conv4"]["bias"],
            "w2": f["conv5"]["weight"].reshape(2 * c, c),
            "b2": f["conv5"]["bias"], "scale": f["gamma"]}


def _gffw_stage_dict(params):
    ln = params["norm2"]["body"]
    f = params["ffn"]
    w1 = f["project_in"]["weight"]
    c, hid = w1.shape[2], w1.shape[3]
    return {"ln_w": ln["weight"], "ln_b": ln.get("bias"), "mode": "gate",
            "w1": w1.reshape(c, hid), "b1": f["project_in"].get("bias"),
            "wd": f["dwconv"]["weight"].reshape(3, 3, hid),
            "bd": f["dwconv"].get("bias"),
            "w2": f["project_out"]["weight"].reshape(hid // 2, c),
            "b2": f["project_out"].get("bias")}


def ra_pair_ok(p1, p2, x, spec: BlockSpec) -> bool:
    """Gate: TWO consecutive ReducedAttn+FFW blocks as ONE kernel
    (kernels/chain2.py — two-row halos). MEASURED NEGATIVE on chip (r4):
    enc1 pair 24.3 ms vs 18.4 for two single-block chained kernels —
    dw->dw chaining shrinks strips, adds redundant halo compute, and
    lengthens the per-program dependency chain Mosaic pipelines across
    grid steps; only the POINTWISE FFW append (ffw2 in fused_block_ffn)
    wins. Opt-in: TURTLE_CHAIN2=1."""
    if (spec.kernels != "pallas" or spec.ffw_type != "FFW"
            or _os.environ.get("TURTLE_CHAIN2", "0") != "1"):
        return False
    from turtlevsr_tpu.kernels.chain2 import two_stage_supported

    c = spec.dim
    dw1 = p1["attn"]["conv1"]["weight"].shape[3]
    dw2 = p2["attn"]["conv1"]["weight"].shape[3]
    return two_stage_supported(x.shape[1], x.shape[2], c, dw1, dw2,
                               2 * c, 2 * c)


def ra_pair_apply(p1, p2, x, spec: BlockSpec):
    from turtlevsr_tpu.kernels.vjp import call_two_stage

    return call_two_stage(x, _ra_stage_dict(p1), _ra_stage_dict(p2),
                          ffw1=_ffw_dict(p1), ffw2=_ffw_dict(p2),
                          interpret=_pallas_interpret())


def ra_gffw_ok(p, x, spec: BlockSpec) -> bool:
    """Gate: one ReducedAttn+GFFW block (refinement) as ONE kernel.
    MEASURED NEGATIVE on chip (r4): 19.9 ms vs 12.9 for the split RA/GFFW
    halves (see ra_pair_ok) — opt-in via TURTLE_CHAIN2=1."""
    if (spec.kernels != "pallas" or spec.ffw_type != "GFFW"
            or _os.environ.get("TURTLE_CHAIN2", "0") != "1"):
        return False
    from turtlevsr_tpu.kernels.chain2 import two_stage_supported

    c = spec.dim
    dw = p["attn"]["conv1"]["weight"].shape[3]
    hid = p["ffn"]["project_in"]["weight"].shape[3]
    return two_stage_supported(x.shape[1], x.shape[2], c, dw, hid // 2)


def ra_gffw_apply(p, x, spec: BlockSpec):
    from turtlevsr_tpu.kernels.vjp import call_two_stage

    return call_two_stage(x, _ra_stage_dict(p), _gffw_stage_dict(p),
                          interpret=_pallas_interpret())


def channel_run_ok(params_list, x, spec: BlockSpec) -> bool:
    """Gate for the level megakernel (kernels/level.py): a run of >=2
    cacheless Channel+GFFW blocks, bias-free convs (the shipped configs),
    whole map + scratch within VMEM. TURTLE_MEGAKERNEL=0 disables."""
    if (spec is None or spec.kernels != "pallas"
            or spec.ffw_type != "GFFW" or len(params_list) < 2):
        return False
    # MEASURED NEGATIVE on chip (r4): latent 9 blocks 9.55 ms vs 8.13 for
    # the split stats+FFN kernels, enc3 16.54 vs 13.46 — the in-kernel
    # strip loop loses Mosaic's cross-strip DMA/compute pipelining, which
    # outweighs the ~5 map round-trips/block it saves; the unrolled-strip
    # variant is compile-pathological (>20 min vs 82 s). Kept tested and
    # opt-in: TURTLE_MEGAKERNEL=1 enables.
    if _os.environ.get("TURTLE_MEGAKERNEL", "0") != "1":
        return False
    for bp in params_list:
        a = bp["attn"]
        f = bp["ffn"]
        if any("bias" in d for d in (
                a["qkv"], a["qkv_dwconv"], a["project_out"],
                f["project_in"], f["dwconv"], f["project_out"])):
            return False
    from turtlevsr_tpu.kernels.level import channel_run_supported

    hid = params_list[0]["ffn"]["project_in"]["weight"].shape[-1]
    return channel_run_supported(x.shape[1], x.shape[2], spec.dim,
                                 hid // 2, len(params_list))


def channel_run_apply(params_list, x, spec: BlockSpec):
    """Apply a run of cacheless Channel+GFFW blocks as ONE megakernel
    call (map resident in VMEM across all blocks); differentiable via the
    XLA-chain VJP."""
    from turtlevsr_tpu.kernels.vjp import call_channel_run

    return call_channel_run(x, params_list, spec, _pallas_interpret())


def attn_block_apply(params, x, spec: BlockSpec, slot: Optional[dict]):
    t = spec.attn_type
    fused = (spec.kernels == "pallas"
             and _ffn_half_supported(params, x, spec))
    if t == "NoAttn":
        if fused:
            return _fused_ffn_half(params, x, spec), None
        ffn = gffw_apply if spec.ffw_type == "GFFW" else ffw_apply
        return x + ffn(params["ffn"], _ln(params["norm2"], x)), None

    if t == "ReducedAttn" and fused:
        if spec.ffw_type == "FFW":
            from turtlevsr_tpu.kernels.ffn import block2_supported

            c = spec.dim
            dw = params["attn"]["conv1"]["weight"].shape[-1]
            if block2_supported(x.shape[1], x.shape[2], c, dw, 2 * c):
                # whole ReducedAttn+FFW block in ONE kernel traversal
                return _fused_reduced_attn_half(params, x, spec,
                                                chain_ffw=True), None
        x = _fused_reduced_attn_half(params, x, spec)
        new_slot = None
    else:
        # the attention funcs take the RAW x plus the norm1 affine so the
        # LN can fuse into their projection kernels
        ln = _ln_args(params, "norm1")
        # the FFN kernel can also absorb the attention's project_out
        # (pair + po inputs), saving one full-map write + read per block.
        # Measured on the 720p bench: C=64 4.52 vs 4.56 fps, and gating it
        # to the wide levels only (C>=128) STILL lost (4.542 vs 4.566) —
        # the in-kernel po matmul on halo'd rows plus the extra streamed
        # block outweigh the saved traversal at every level on this chip.
        # The capability stays tested (test_kernels_bench_shapes) for
        # configs where the balance differs.
        skip_po = False
        if t == "Channel":
            if (fused and spec.ffw_type == "GFFW"
                    and channel_stats_supported(params["attn"], x, spec)):
                # fully fused cacheless channel block: stats kernel (q/k
                # maps stay in VMEM) + tiny XLA softmax + the attention
                # apply & project_out folded into the FFN kernel as the
                # data-dependent po' = blockdiag(attn^T) @ W_po
                v_map, po_w, po_b = channel_attention_stats_apply(
                    params["attn"], x, spec.num_heads, ln, spec)
                po = {"weight": po_w}
                if po_b is not None:
                    po["bias"] = po_b
                return _fused_ffn_half(params, x, spec, x2=v_map,
                                       po=po), None
            a, new_slot = channel_attention_apply(params["attn"], x,
                                                  spec.num_heads, ln=ln,
                                                  spec=spec, skip_po=skip_po)
        elif t == "ReducedAttn":
            a, new_slot = reduced_attn_apply(params["attn"],
                                             _ln(params["norm1"], x))
        elif t == "FHR":
            a, new_slot = fhr_apply(params["attn"], x, spec.num_heads, slot,
                                    ln=ln, spec=spec, skip_po=skip_po)
        elif t == "CHM":
            if fused and spec.ffw_type == "GFFW" and chm_av_in_ffn_supported(
                    params["attn"], x, spec, slot,
                    params["ffn"]["project_in"]["weight"].shape[-1] // 2):
                # CHM attention apply + project_out fold into the FFN
                # kernel as nf+1 pair maps with composed attn@W_po
                # matrices (see chm_apply return_av)
                (maps, pos, pob), new_slot = chm_apply(
                    params["attn"], x, spec.num_heads, spec.window_size,
                    spec.variant, slot, ln=ln, spec=spec, return_av=True)
                po = {"weight": pos}
                if pob is not None:
                    po["bias"] = pob
                return _fused_ffn_half(params, x, spec, x2=maps,
                                       po=po), new_slot
            a, new_slot = chm_apply(params["attn"], x, spec.num_heads,
                                    spec.window_size, spec.variant, slot,
                                    ln=ln, spec=spec, skip_po=skip_po)
        else:
            raise ValueError(t)
        if fused:
            po = None
            if skip_po:
                po = (params["attn"]["ChanAttn"]["project_out"]
                      if t == "CHM" else params["attn"]["project_out"])
            return _fused_ffn_half(params, x, spec, x2=a, po=po), new_slot
        x = x + a
    if fused:
        return _fused_ffn_half(params, x, spec), new_slot
    ffn = gffw_apply if spec.ffw_type == "GFFW" else ffw_apply
    x = x + ffn(params["ffn"], _ln(params["norm2"], x))
    return x, new_slot
