"""Pallas TPU kernel: TWO chained dw-conv stages in one map traversal.

Covers two block shapes of the Turtle U-Net (turtle_arch.py:627-665,
:162-213, wired per :727-734):

  * a PAIR of consecutive ReducedAttn+FFW blocks (enc1/enc2) — stage 1 =
    block A's ReducedAttn half (+ its pointwise FFW), stage 2 = block B's
    ReducedAttn half (+ FFW): ONE kernel for two whole blocks;
  * one ReducedAttn+GFFW block (refinement) — stage 1 = the ReducedAttn
    half, stage 2 = the GFFW gate half: ONE kernel for the block.

The first dw stage needs its output on s+2 rows (the second stage's dw
halo), so the strip fetches a TWO-row halo each side (five clamped row
blocks) and border handling switches from the f0/fl strip-position masks
to image-row identity masks (_img_row_masks): the stage-1 output window
starts at image row i*s - 1, where "first window row == image row 0" is
no longer a static position. Intermediates cast through the model dtype
exactly where the split kernels round-tripped HBM, so results are
bitwise the split chain's.

Stage 2 supports the channels-major hidden layout (the refinement GFFW's
e = 160 pads 1.6x token-major — _cm_chain reads the SAME pixels-major LN
scratch, so mixing layouts across stages is free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turtlevsr_tpu.kernels.ffn import (
    _chan_major_ok,
    _cm_chain,
    _col_wrap_masks,
    _col_wrap_masks_lane,
    _dg_f32,
    _gelu_exact,
    _img_row_masks,
    _ln_2d_f32,
    _pad128,
    _proj_tap_args,
    _tm_chain,
    _VMEM_BUDGET_HONEST,
    _VMEM_LIMIT,
)


def _dw2_kernel(xt2, xt1, xm, xb1, xb2, *rest, st1, f1, st2, f2, cm2,
                s_rows, w_img, h_img, e1, e2, interpret):
    """st1/st2: (mode, has_b1, ln_mode); f1/f2: FFW ln_mode or None;
    cm2: stage-2 channels-major. rest: stage-1 args, ffw1 args, stage-2
    args, ffw2 args, out_ref, xr/xn/h1/h2 scratches."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    def take_stage(mode, has_b1, cm):
        lnw, lnb = take(2)
        halves = []
        for _ in range(2 if mode == "gate" else 1):
            w1h = take(1)[0]
            wd = take(9) if cm else take(1)[0]
            svh = take(9) if has_b1 else None
            bcols = take(2) if (cm and has_b1) else None
            halves.append((w1h, wd, svh, bcols))
        w2r, b2r, scr = take(3)
        return lnw, lnb, halves, w2r, b2r, scr

    S1 = take_stage(st1[0], st1[1], False)
    F1 = take(7) if f1 else None
    S2 = take_stage(st2[0], st2[1], cm2)
    F2 = take(7) if f2 else None
    out_ref, xr_ref, xn_ref, h1_ref, h2_ref = rest[idx:]

    i = pl.program_id(1)
    w = w_img
    sw = s_rows * w
    n1 = sw + 2 * w
    n2 = sw + 4 * w
    cdt = xm.dtype
    cml2, cmr2 = _col_wrap_masks(n2, w)
    v2, _, _ = _img_row_masks(i, s_rows, w, h_img, n2, 2)
    v1, mt1, mb1 = _img_row_masks(i, s_rows, w, h_img, n1, 1)
    _, mt0, mb0 = _img_row_masks(i, s_rows, w, h_img, sw, 0)

    # raw x rows (residual source); out-of-image clamped rows carry
    # garbage and are neutralised by the v-masks downstream
    xr_ref[0:w] = xt2[0]
    xr_ref[w:2 * w] = xt1[0]
    xr_ref[2 * w:2 * w + sw] = xm[0]
    xr_ref[2 * w + sw:3 * w + sw] = xb1[0]
    xr_ref[3 * w + sw:n2] = xb2[0]

    lnw1, lnb1_, halves1, w2_1, b2_1, sc_1 = S1
    xn_ref[:] = _ln_2d_f32(xr_ref[:], lnw1, lnb1_, st1[2]) * v2
    xn_cdt = xn_ref[:].astype(cdt)

    def tm_stage(xn_c, halves, w2r, b2r, scr, mode, n, sw_out, e_dim,
                 href, mt_mb):
        cml, cmr = _col_wrap_masks(n, w)

        def half(hh):
            w1h, wd9h, svh, _ = hh
            return _tm_chain(xn_c, w1h, wd9h, href, cml, cmr, w=w,
                             sw=sw_out, n=n, e_dim=e_dim, sv=svh,
                             mt_mb=mt_mb)

        if mode == "gate":
            act = _gelu_exact(half(halves[0])) * half(halves[1])
        else:
            act = _gelu_exact(half(halves[0]))
        o = jnp.dot(act.astype(cdt), w2r[:],
                    preferred_element_type=jnp.float32)
        return (o + b2r[:].astype(jnp.float32)) * scr[:].astype(jnp.float32)

    # ---- stage 1: output window [w, w + n1) (s+2 rows) ----
    o1 = tm_stage(xn_cdt, halves1, w2_1, b2_1, sc_1, st1[0], n2, n1, e1,
                  h1_ref, (mt1, mb1))
    y = (o1 + xr_ref[w:w + n1].astype(jnp.float32)) * v1
    y_b = y.astype(cdt)

    def pw_ffw(F, lnm, y_c, vmask):
        flnw, flnb, fw1, fb1, fw2, fb2, fsc = F
        yn = _ln_2d_f32(y_c, flnw, flnb, lnm).astype(cdt)
        hd = jnp.dot(yn, fw1[:], preferred_element_type=jnp.float32)
        hd = hd + fb1[:].astype(jnp.float32)
        o = jnp.dot(_gelu_exact(hd).astype(cdt), fw2[:],
                    preferred_element_type=jnp.float32)
        o = (o + fb2[:].astype(jnp.float32)) * fsc[:].astype(jnp.float32)
        o = o + y_c.astype(jnp.float32)
        if vmask is not None:
            o = o * vmask
        return o.astype(cdt)

    if F1 is not None:
        y_b = pw_ffw(F1, f1, y_b, v1)

    # ---- stage 2: LN over the s+2 y rows, output the s main rows ----
    lnw2, lnb2_, halves2, w2_2, b2_2, sc_2 = S2
    xn2 = (_ln_2d_f32(y_b, lnw2, lnb2_, st2[2]) * v1).astype(cdt)
    if cm2:
        cml_l, cmr_l = _col_wrap_masks_lane(n1, w)

        def cm_half(hh):
            w1h, wdT, _, bcols = hh
            b1c, bdc = bcols if bcols is not None else (None, None)
            # the v1 zeroing already ran on xn2; border-bias re-zeroing
            # is keyed on mt/mb via f0/fl slots unused here (bias-free
            # GFFW is the only shipped cm2 user)
            return _cm_chain(xn2, w1h, wdT, h2_ref, cml_l, cmr_l, w=w,
                             sw=sw, n=n1, e_dim=e2, interpret=interpret,
                             b1_col=b1c, bd_col=bdc)

        if st2[0] == "gate":
            act = _gelu_exact(cm_half(halves2[0])) * cm_half(halves2[1])
        else:
            act = _gelu_exact(cm_half(halves2[0]))
        o2 = _dg_f32(act.astype(cdt), w2_2[:], ((0,), (0,)), interpret)
        o2 = (o2 + b2_2[:].astype(jnp.float32)) \
            * sc_2[:].astype(jnp.float32)
    else:
        o2 = tm_stage(xn2, halves2, w2_2, b2_2, sc_2, st2[0], n1, sw, e2,
                      h2_ref, (mt0, mb0))
    out = o2 + y_b[w:w + sw].astype(jnp.float32)
    if F2 is not None:
        out = pw_ffw(F2, f2, out.astype(cdt), None).astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _mem2(s: int, w: int, c: int, e1: int, e2: int, f1e: int,
          f2e: int) -> int:
    n1 = (s + 2) * w
    n2 = (s + 4) * w
    cp = _pad128(c)
    mem = (n2 * cp * 2 + n2 * cp * 4          # xr bf16 + xn fp32
           + 2 * n2 * _pad128(e1) * 4          # h1 + rolled base
           + 2 * n1 * _pad128(e2) * 4          # h2 + rolled base
           + 4 * n1 * max(_pad128(e1), _pad128(e2)) * 4  # act transients
           + 4 * n1 * cp * 4                   # y / y2 / out values
           + 10 * w * cp * 2 + 4 * s * w * cp * 2  # blocked ins + out
           + 4 * n2 * 512)                     # wrap/row masks
    if f1e:
        mem += 3 * n1 * _pad128(f1e) * 4
    if f2e:
        mem += 3 * s * w * _pad128(f2e) * 4
    return mem


def _pick_strip2(h: int, w: int, c: int, e1: int, e2: int, f1e: int,
                 f2e: int) -> int:
    best = 0
    for s in range(1, min(h, 32) + 1):
        if h % s == 0 and _mem2(s, w, c, e1, e2, f1e, f2e) \
                <= _VMEM_BUDGET_HONEST:
            best = s
    return best


def two_stage_supported(h: int, w: int, c: int, e1: int, e2: int,
                        f1e: int = 0, f2e: int = 0) -> bool:
    return w % 8 == 0 and _pick_strip2(h, w, c, e1, e2, f1e, f2e) > 0


def _stage_args(st, e_dim, cm, zeros):
    """Flat arg list for one dw stage dict {ln_w, ln_b?, mode, w1 (C,CH),
    b1?, wd (3,3,CH), bd?, w2 (E,C), b2?, scale?}."""
    import numpy as _np

    c = st["w1"].shape[0]
    ch = st["w1"].shape[1]
    gate = st["mode"] == "gate"
    has_b1 = st.get("b1") is not None or st.get("bd") is not None
    lnb = st.get("ln_b")
    args = [st["ln_w"], lnb if lnb is not None else zeros((c,))]
    wd9 = st["wd"].reshape(9, ch).astype(jnp.float32)
    b1f = (st["b1"] if st.get("b1") is not None
           else zeros((ch,))).astype(jnp.float32)
    bdf = (st["bd"] if st.get("bd") is not None
           else zeros((ch,))).astype(jnp.float32)
    for hlf in range(2 if gate else 1):
        lo = hlf * e_dim
        w1h = st["w1"][:, lo:lo + e_dim]
        wd9h = wd9[:, lo:lo + e_dim]
        if cm:
            args += [w1h, *[wd9h[k][:, None] for k in range(9)]]
            if has_b1:
                args += [b1f[lo:lo + e_dim][:, None],
                         bdf[lo:lo + e_dim][:, None]]
        else:
            args += _proj_tap_args(
                dict(w1=w1h, wd=wd9h.reshape(3, 3, e_dim),
                     b1=b1f[lo:lo + e_dim] if has_b1 else None,
                     bd=bdf[lo:lo + e_dim] if has_b1 else None),
                wd9h, e_dim, has_b1, zeros)
    out_c = st["w2"].shape[1]
    args += [st["w2"],
             st["b2"] if st.get("b2") is not None else zeros((out_c,)),
             st["scale"] if st.get("scale") is not None
             else jnp.ones((out_c,), st["w1"].dtype)]
    statics = (st["mode"], has_b1,
               "none" if st.get("ln_w") is None
               else ("bias_free" if lnb is None else "with_bias"))
    return args, statics


def _ffw_args(f, c, zeros):
    lnb = f.get("ln_b")
    fe = f["w1"].shape[1]
    return ([f["ln_w"], lnb if lnb is not None else zeros((c,)),
             f["w1"], f["b1"], f["w2"], f["b2"], f["scale"]],
            "bias_free" if lnb is None else "with_bias")


def fused_two_stage(x, st1, st2, *, ffw1=None, ffw2=None,
                    interpret: bool = False):
    """Run two chained dw stages (each x + scale*(pw2(act(dw(pw1(LN x)))))
    + b2), each optionally followed by a pointwise FFW half, in ONE pass
    over NHWC ``x``. Returns (B, H, W, C)."""
    b, h, w, c = x.shape
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    e1 = st1["w1"].shape[1] // (2 if st1["mode"] == "gate" else 1)
    e2 = st2["w1"].shape[1] // (2 if st2["mode"] == "gate" else 1)
    cm2 = (st2["mode"] == "gate"
           and st2.get("b1") is None and st2.get("bd") is None
           and _chan_major_ok(e2, w, False))
    a1, s1 = _stage_args(st1, e1, False, zeros)
    a2, s2 = _stage_args(st2, e2, cm2, zeros)
    f1a, f1m = _ffw_args(ffw1, c, zeros) if ffw1 else ([], None)
    f2a, f2m = _ffw_args(ffw2, c, zeros) if ffw2 else ([], None)

    s_rows = _pick_strip2(h, w, c, e1, e2,
                          ffw1["w1"].shape[1] if ffw1 else 0,
                          ffw2["w1"].shape[1] if ffw2 else 0)
    assert s_rows, "no feasible strip for the two-stage kernel"
    sw = s_rows * w
    n1 = sw + 2 * w
    n2 = sw + 4 * w

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    last = h - 1
    s_ = s_rows
    xf = x.reshape(b, h * w, c)
    row = lambda off, clamp_hi: pl.BlockSpec(  # noqa: E731
        (1, w, c),
        lambda b_, i, _o=off, _hi=clamp_hi: (
            b_, jnp.clip(i * s_ + _o, 0, _hi), 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        row(-2, last), row(-1, last),
        pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        row(s_rows, last), row(s_rows + 1, last),
    ]
    args = a1 + f1a + a2 + f2a
    in_specs += [vmem()] * len(args)
    kernel = functools.partial(
        _dw2_kernel, st1=s1, f1=f1m, st2=s2, f2=f2m, cm2=cm2,
        s_rows=s_rows, w_img=w, h_img=h, e1=e1, e2=e2, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(b, h // s_rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), dt),
        scratch_shapes=[
            pltpu.VMEM((n2, c), dt),               # raw x rows
            pltpu.VMEM((n2, c), jnp.float32),      # LN scratch
            pltpu.VMEM((n2, e1), jnp.float32),     # stage-1 hidden
            pltpu.VMEM((e2, n1) if cm2 else (n1, e2),
                       jnp.float32),               # stage-2 hidden
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xf, xf, xf, xf, xf, *args).reshape(b, h, w, c)
