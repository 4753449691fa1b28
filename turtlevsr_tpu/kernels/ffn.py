"""Pallas TPU kernel: the fused conv-FFN half of a Turtle block.

Computes, in ONE pass over the feature map:

    out = x + scale * pw2( act( dw3x3( pw1( LN(x) ) ) ) )

which covers the reference's GatedFeedForward (gate act), FeedForward
(gelu act, no dwconv, gamma scale), and ReducedAttn (gelu act, beta scale)
chains (turtle_arch.py:162-213, :627-665) together with their pre-LayerNorm
and residual wiring (turtle_arch.py:727-734).

Why: these chains are the framework's bandwidth hot spot. XLA materialises
the (H, W, hidden) maps in HBM between each op (~5-6 GB of traffic per
full-resolution block at 720p); this kernel keeps the hidden activations in
VMEM per spatial tile, so HBM traffic drops to one read of x + one write of
out + weights.

Layout/constraints (Mosaic):
  * x is NHWC, zero-padded spatially by the caller: 1-px halo for the dw3x3
    plus right-padding so the DMA'd tile width is 8-aligned (sublane tiling);
  * no reshapes that touch the (sublane, lane) dims — matmuls are rank-3
    ``dot_general`` over the channel axis;
  * out-of-image halo pixels (which carry LN-bias garbage, since the
    reference zero-pads AFTER pw1) are zeroed with full-shape iota masks;
  * gelu uses an erf rational approximation (no erf primitive on TPU Pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
_VMEM_BUDGET = 5 * 1024 * 1024  # bytes for the big per-tile buffers


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(h: int, w: int, c: int, ch: int, halo: int) -> tuple:
    """Largest (th, tw) with th|h, tw|w (tw 8-aligned) in the VMEM budget."""

    def divisors(n, cap):
        return [d for d in range(1, min(n, cap) + 1) if n % d == 0]

    best = None
    for tw in divisors(w, 512):
        if tw % 8 and tw != w:
            continue
        for th in divisors(h, 128):
            ww_s = _round_up(tw + 2 * halo, 8) if halo else tw
            rows = (th + 2 * halo) * ww_s
            mem = rows * c * 2 + rows * ch * 2 + th * tw * ch * 4 \
                + th * tw * c * 2
            if mem <= _VMEM_BUDGET:
                area = th * tw
                if best is None or area > best[2] or (
                        area == best[2] and tw > best[1]):
                    best = (th, tw, area)
    if best is None:
        raise ValueError(f"no feasible ffn tile for h={h} w={w} c={c} ch={ch}")
    return best[0], best[1]


def _erf(v):
    # Pallas TPU has no erf/erfc lowering; Abramowitz & Stegun 7.1.26
    # rational approximation, |err| <= 1.5e-7 — far below bf16 noise.
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


def _ffn_kernel(x_hbm, ln_w, ln_b, w1, b1, wd, bd, w2, b2, scale, out_ref,
                xtile, h1_ref, sem, *, mode: str, ln_mode: str, th: int,
                tw: int, c: int, ch: int, halo: int, residual: bool,
                img_h: int, img_w: int, ww_s: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    hh = th + 2 * halo
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, hh), pl.ds(j * tw, ww_s), :], xtile, sem)
    copy.start()
    copy.wait()

    x = xtile[:]  # (hh, ww_s, c)

    if ln_mode != "none":
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        g = ln_w[:].astype(jnp.float32)
        if ln_mode == "bias_free":
            xn = (xf * inv * g).astype(x.dtype)
        else:
            xn = ((xf - mu) * inv * g
                  + ln_b[:].astype(jnp.float32)).astype(x.dtype)
    else:
        xn = x

    # pw1: contract channels on the rank-3 tile (Mosaic can't reshape the
    # sublane dim, so no flatten-to-2D)
    h1 = jax.lax.dot_general(xn, w1[:], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = h1 + b1[:].astype(jnp.float32)

    if halo:
        # zero out-of-image halo pixels (the reference zero-pads AFTER pw1).
        # padded coords: in-image rows/cols are [1, img+1)
        gr = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0) + i * th
        gc = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 1) + j * tw
        inside = ((gr >= 1) & (gr <= img_h) & (gc >= 1) & (gc <= img_w))
        h1_ref[:] = jnp.where(inside, h1, 0.0).astype(xtile.dtype)

        # depthwise 3x3, stride 1: 9 shifted VPU multiply-adds, fp32 acc
        acc = jnp.zeros((th, tw, ch), jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc += (h1_ref[di:di + th, dj:dj + tw, :].astype(jnp.float32)
                        * wd[di, dj, :].astype(jnp.float32))
        hd = acc + bd[:].astype(jnp.float32)
    else:
        hd = h1

    if mode == "gate":
        e = ch // 2
        act = _gelu_exact(hd[..., :e]) * hd[..., e:]
    elif mode == "gelu":
        act = _gelu_exact(hd)
    else:
        raise ValueError(mode)

    out = jax.lax.dot_general(act.astype(x.dtype), w2[:],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + b2[:].astype(jnp.float32)
    out = out * scale[:].astype(jnp.float32)
    if residual:
        center = x[halo:halo + th, halo:halo + tw, :]
        out = out + center.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_block_ffn(x, *, ln_w=None, ln_b=None, w1, b1=None, wd=None, bd=None,
                    w2, b2=None, scale=None, mode: str, residual: bool = True,
                    interpret: bool = False):
    """Apply the fused FFN chain to NHWC ``x``.

    Args:
      x: (B, H, W, C).
      ln_w/ln_b: channel LayerNorm affine; ln_b None => bias-free LN;
        ln_w None => no LN.
      w1: (C, CH) pointwise-in weights (HWIO kernels squeezed by caller).
      wd/bd: (3, 3, CH) depthwise weights; wd None => no dwconv (FFW).
      w2: (E, C) pointwise-out weights, E = CH//2 for 'gate' else CH.
      scale: optional (C,) output scale (FFW gamma / ReducedAttn beta).
      mode: 'gate' (GFFW) or 'gelu' (FFW / ReducedAttn).
      residual: add x.
    """
    b, h, w, c = x.shape
    ch = w1.shape[1]
    halo = 1 if wd is not None else 0
    th, tw = _pick_tile(h, w, c, ch, halo)
    ww_s = _round_up(tw + 2 * halo, 8) if halo else tw

    if halo:
        # left/top: 1; right: enough that every tile's DMA window fits
        pad_r = (ww_s - (tw + 2 * halo)) + halo
        xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, pad_r), (0, 0)))
    else:
        xp = x

    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    args = (
        xp,
        ln_w if ln_w is not None else zeros((c,)),
        ln_b if ln_b is not None else zeros((c,)),
        w1,
        b1 if b1 is not None else zeros((ch,)),
        wd if wd is not None else zeros((3, 3, ch)),
        bd if bd is not None else zeros((ch,)),
        w2,
        b2 if b2 is not None else zeros((c,)),
        scale if scale is not None else jnp.ones((c,), dt),
    )

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid = (b, h // th, w // tw)
    kernel = functools.partial(
        _ffn_kernel, mode=mode, ln_mode=ln_mode, th=th, tw=tw, c=c, ch=ch,
        halo=halo, residual=residual, img_h=h, img_w=w, ww_s=ww_s)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM, manual DMA
            vmem(), vmem(),          # ln
            vmem(), vmem(),          # w1, b1
            vmem(), vmem(),          # wd, bd
            vmem(), vmem(),          # w2, b2
            vmem(),                  # scale
        ],
        out_specs=pl.BlockSpec((1, th, tw, c), lambda b_, i, j: (b_, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * halo, ww_s, c), dt),
            pltpu.VMEM((th + 2 * halo, ww_s, ch), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
