"""Pallas TPU kernel: the fused conv-FFN half of a Turtle block.

Computes, in ONE pass over the feature map:

    out = x + scale * pw2( act( dw3x3( pw1( LN(x) ) ) ) )

covering the reference's GatedFeedForward (gate act), FeedForward (gelu, no
dwconv, gamma scale) and ReducedAttn (gelu, beta scale) chains
(turtle_arch.py:162-213, :627-665) plus their pre-LayerNorm/residual wiring
(turtle_arch.py:727-734). These chains are the bandwidth hot spot: XLA
materialises the (H, W, hidden) maps in HBM between ops (~5 GB of traffic
per full-res 720p block); fused, traffic drops to ~3 reads of x + 1 write.

Mosaic constraints shape the design (discovered empirically on v5e):
  * rank-3 dot_general and sublane-merging reshapes hang/fail the compiler
    -> everything is strictly 2D: the image is flattened to (H*W, C) rows
       and the grid walks strips of S image rows;
  * dw3x3 halo -> strips are DMA'd with one extra image row above/below
    (flattened: +W rows each side), taps become rolls by {±W±1, ±W, ±1};
  * pltpu.roll only rotates 32-bit data -> bf16 hidden is bitcast to int32
    (channel pairs) for the roll, lanes are untouched by a sublane roll;
  * DMA slices must be 8-aligned on the sublane dim -> W % 8 == 0 required
    (callers fall back to the XLA path otherwise);
  * column wrap-around of the flattened ±1 taps (and the roll's circular
    wrap) is cancelled by precomputed column masks; out-of-image top/bottom
    halo rows (which carry LN-bias garbage because the reference zero-pads
    AFTER pw1) by first/last-strip row masks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
_VMEM_BUDGET = 9 * 1024 * 1024


def _pick_strip(h: int, w: int, c: int, ch: int, halo: int) -> int:
    """Rows per strip S (S | H) fitting the VMEM budget."""
    best = 0
    for s in range(1, min(h, 64) + 1):
        if h % s:
            continue
        n = (s + 2 * halo) * w
        mem = n * c * 2 + n * ch * 2 + s * w * ch * 4 + s * w * c * 2
        if mem <= _VMEM_BUDGET:
            best = s
    return best


def _erf(v):
    # No erf/erfc primitive on TPU Pallas; Abramowitz & Stegun 7.1.26,
    # |err| <= 1.5e-7 — far below bf16 noise.
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(v)
    av = jnp.abs(v)
    t = 1.0 / (1.0 + p * av)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-av * av))


def _gelu_exact(v):
    return 0.5 * v * (1.0 + _erf(v * (2.0 ** -0.5)))


def _ln_2d(x, ln_w, ln_b, ln_mode):
    if ln_mode == "none":
        return x
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    g = ln_w[:].astype(jnp.float32)
    if ln_mode == "bias_free":
        return (xf * inv * g).astype(x.dtype)
    return ((xf - mu) * inv * g + ln_b[:].astype(jnp.float32)).astype(x.dtype)


def _roll_rows(v, shift: int):
    """Sublane roll that works for 16-bit data via int32 bitcast."""
    n = v.shape[0]
    shift = shift % n
    if shift == 0:
        return v
    if v.dtype.itemsize == 4:
        return pltpu.roll(v, shift=shift, axis=0)
    assert v.dtype.itemsize == 2 and v.shape[1] % 2 == 0
    as32 = pltpu.bitcast(v, jnp.int32)  # (n, ch//2)
    return pltpu.bitcast(pltpu.roll(as32, shift=shift, axis=0), v.dtype)


def _dw_kernel(x_hbm, ln_w, ln_b, w1, b1, wd, bd, w2, b2, scale, cm_l, cm_r,
               top_m, bot_m, out_ref, xtile, h1_ref, sem, *, mode, ln_mode,
               s_rows, w_img, c, ch, residual):
    b = pl.program_id(0)
    i = pl.program_id(1)
    sw = s_rows * w_img
    n = (s_rows + 2) * w_img

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * sw, n), :], xtile, sem)
    copy.start()
    copy.wait()
    x = xtile[:]  # (n, c)

    xn = _ln_2d(x, ln_w, ln_b, ln_mode)
    h1 = jnp.dot(xn, w1[:], preferred_element_type=jnp.float32)
    h1 = (h1 + b1[:].astype(jnp.float32)).astype(x.dtype)
    h1_ref[:] = h1

    last = pl.num_programs(1) - 1
    ones = cm_l[:] * 0.0 + 1.0
    acc = jnp.zeros((sw, ch), jnp.float32)
    for di in (-1, 0, 1):
        # top/bottom strip fix: taps reaching the zero-pad image rows carry
        # LN-bias/b1 garbage — mask them on the boundary strips only
        if di == -1:
            rowm = jnp.where(i == 0, top_m[:], ones)
        elif di == 1:
            rowm = jnp.where(i == last, bot_m[:], ones)
        else:
            rowm = ones
        for dj in (-1, 0, 1):
            colm = cm_l[:] if dj == -1 else (cm_r[:] if dj == 1 else ones)
            off = di * w_img + dj
            shifted = _roll_rows(h1_ref[:], -off)[w_img:w_img + sw, :]
            k = (di + 1) * 3 + (dj + 1)
            acc += (shifted.astype(jnp.float32) * (rowm * colm)
                    * wd[k].astype(jnp.float32))
    hd = acc + bd[:].astype(jnp.float32)

    if mode == "gate":
        e = ch // 2
        act = _gelu_exact(hd[:, :e]) * hd[:, e:]
    else:
        act = _gelu_exact(hd)

    out = jnp.dot(act.astype(x.dtype), w2[:],
                  preferred_element_type=jnp.float32)
    out = (out + b2[:].astype(jnp.float32)) * scale[:].astype(jnp.float32)
    if residual:
        out = out + x[w_img:w_img + sw, :].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _pw_kernel(x_ref, ln_w, ln_b, w1, b1, w2, b2, scale, out_ref, *, mode,
               ln_mode, residual):
    """No-dwconv variant (FFW): plain blocked rows, no halo/DMA."""
    x = x_ref[0]
    xn = _ln_2d(x, ln_w, ln_b, ln_mode)
    hd = jnp.dot(xn, w1[:], preferred_element_type=jnp.float32)
    hd = hd + b1[:].astype(jnp.float32)
    if mode == "gate":
        e = hd.shape[-1] // 2
        act = _gelu_exact(hd[:, :e]) * hd[:, e:]
    else:
        act = _gelu_exact(hd)
    out = jnp.dot(act.astype(x.dtype), w2[:],
                  preferred_element_type=jnp.float32)
    out = (out + b2[:].astype(jnp.float32)) * scale[:].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def ffn_pallas_supported(h: int, w: int, c: int, ch: int,
                         has_dw: bool) -> bool:
    if w % 8 or c % 2 or ch % 2:
        return False
    if has_dw and _pick_strip(h, w, c, ch, 1) == 0:
        return False
    return True


def fused_block_ffn(x, *, ln_w=None, ln_b=None, w1, b1=None, wd=None, bd=None,
                    w2, b2=None, scale=None, mode: str, residual: bool = True,
                    interpret: bool = False):
    """Apply the fused FFN chain to NHWC ``x`` (see module docstring).

    w1: (C, CH); wd/bd: (3, 3, CH) or None (no dwconv); w2: (E, C) with
    E = CH//2 for 'gate' else CH; scale: optional (C,) output scale.
    """
    b, h, w, c = x.shape
    ch = w1.shape[1]
    halo = 1 if wd is not None else 0
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else zeros((c,)),
               ln_b if ln_b is not None else zeros((c,)))
    b1a = b1 if b1 is not None else zeros((ch,))
    e_dim = ch // 2 if mode == "gate" else ch
    b2a = b2 if b2 is not None else zeros((c,))
    sc = scale if scale is not None else jnp.ones((c,), dt)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    if not halo:
        xf = x.reshape(b, h * w, c)
        rows = h * w
        s = rows
        while s * (c * 4 + ch * 6) > _VMEM_BUDGET and s % 2 == 0:
            s //= 2
        grid = (b, rows // s)
        out = pl.pallas_call(
            functools.partial(_pw_kernel, mode=mode, ln_mode=ln_mode,
                              residual=residual),
            grid=grid,
            in_specs=[pl.BlockSpec((1, s, c), lambda b_, i: (b_, i, 0),
                                   memory_space=pltpu.VMEM),
                      vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem()],
            out_specs=pl.BlockSpec((1, s, c), lambda b_, i: (b_, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, rows, c), dt),
            interpret=interpret,
        )(xf, *ln_args, w1, b1a, w2, b2a, sc)
        return out.reshape(b, h, w, c)

    assert w % 8 == 0, "fused dw-FFN kernel needs W % 8 == 0"
    s_rows = _pick_strip(h, w, c, ch, 1)
    assert s_rows, "no feasible strip size; use the XLA path"
    sw = s_rows * w

    # flatten with one zero image row above/below (the dw halo)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0))).reshape(
        b, (h + 2) * w, c)

    # column masks: the flattened ±1 taps wrap across image rows — the
    # reference's dw zero-padding means those contributions are 0
    col = np.arange(sw) % w
    cm_l = jnp.asarray((col != 0).astype(np.float32)[:, None])
    cm_r = jnp.asarray((col != w - 1).astype(np.float32)[:, None])
    # first/last strip: taps into the zero-pad image rows contribute 0
    row = np.arange(sw) // w
    top_m = jnp.asarray((row != 0).astype(np.float32)[:, None])
    bot_m = jnp.asarray((row != s_rows - 1).astype(np.float32)[:, None])

    wd9 = wd.reshape(9, ch)
    bda = bd if bd is not None else zeros((ch,))

    grid = (b, h // s_rows)
    kernel = functools.partial(
        _dw_kernel, mode=mode, ln_mode=ln_mode, s_rows=s_rows, w_img=w, c=c,
        ch=ch, residual=residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [vmem()] * 13,
        out_specs=pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), dt),
        scratch_shapes=[
            pltpu.VMEM(((s_rows + 2) * w, c), dt),
            pltpu.VMEM(((s_rows + 2) * w, ch), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *ln_args, w1, b1a, wd9, bda, w2, b2a, sc, cm_l, cm_r, top_m,
      bot_m).reshape(b, h, w, c)
