"""Pallas TPU kernels: the SAB lattice split/merge permutation as pure
block copies.

The reference's einops '(p1 h)' windowing (turtle_arch.py:487-492,
turtle_t1_arch.py:601-607) is a STRIDED lattice: token (i, j) gathers the
pixels {(a*hh + i, b*ww + j) : a, b in [0, ws)}, feature order (a, b, c).
XLA lowers the resulting 6-D transpose at ~5x off HBM bandwidth (measured
720p); but because the window factors a/b are OUTERMOST in the pixel
index, the map reshapes LOSSLESSLY to (BN, ws, hh, ws, ww, c) and the
whole permutation decomposes into (ww, c) tile moves whose lane offsets
are multiples of c. For c % 128 == 0 (the dec2/dec3 widths) every access
is therefore an aligned block or a 128-multiple lane slice — the known
-good subset of Mosaic — and the permutation runs as a grid of pure VMEM
block copies at HBM bandwidth.

c = 64 levels (dec1) stay on XLA: the (j <-> b) swap there moves 64-lane
-grain chunks, and every in-kernel decomposition needs either a
sublane-merging reshape or a non-128 lane offset — both documented Mosaic
compiler hangs (CLAUDE.md). Structural, not a tuning gap.

Grid layout (merge): one step per (batch*frame, a, i) = one slot-row of
one token-row; the input block is that token row's a-slice (ww, ws*c) and
the output block is the ws contiguous (ww, c) map tiles it scatters to —
input read once, output written once, zero arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lattice_supported(h: int, w: int, c: int, ws: int) -> bool:
    """c must be a lane-tile multiple (the copy granularity); ws*c and ww*c
    follow automatically. h/w divisibility mirrors the XLA path's."""
    return (c % 128 == 0 and ws >= 1 and h % ws == 0 and w % ws == 0)


def _merge_kernel(t_ref, o_ref, *, ws: int, c: int):
    row = t_ref[0]  # (ww, ws*c) — one token row, one a-slot
    for b in range(ws):
        o_ref[0, b] = row[:, b * c:(b + 1) * c]


def _split_kernel(m_ref, o_ref, *, ws: int, c: int):
    for b in range(ws):
        o_ref[0, :, b * c:(b + 1) * c] = m_ref[0, b]


def _merge_impl(t, ws: int, h: int, w: int, interpret: bool):
    bn, hw, d = t.shape
    c = d // (ws * ws)
    hh, ww = h // ws, w // ws
    tin = t.reshape(bn * hh, ww, d)
    out = pl.pallas_call(
        functools.partial(_merge_kernel, ws=ws, c=c),
        grid=(bn, ws, hh),
        in_specs=[pl.BlockSpec((1, ww, ws * c),
                               lambda n, a, i: (n * hh + i, 0, a))],
        out_specs=pl.BlockSpec((1, ws, ww, c),
                               lambda n, a, i: ((n * ws + a) * hh + i,
                                                0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bn * ws * hh, ws, ww, c), t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(tin)
    return out.reshape(bn, h, w, c)


def _split_impl(x, ws: int, interpret: bool):
    bn, h, w, c = x.shape
    hh, ww = h // ws, w // ws
    xin = x.reshape(bn * ws * hh, ws, ww, c)
    out = pl.pallas_call(
        functools.partial(_split_kernel, ws=ws, c=c),
        grid=(bn, ws, hh),
        in_specs=[pl.BlockSpec((1, ws, ww, c),
                               lambda n, a, i: ((n * ws + a) * hh + i,
                                                0, 0, 0))],
        out_specs=pl.BlockSpec((1, ww, ws * c),
                               lambda n, a, i: (n * hh + i, 0, a)),
        out_shape=jax.ShapeDtypeStruct((bn * hh, ww, ws * ws * c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(xin)
    return out.reshape(bn, hh * ww, ws * ws * c)


# The two permutations are mutual inverses, so each op's VJP is the other.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def lattice_merge_op(t, ws: int, h: int, w: int, interpret: bool = False):
    """(BN, hh*ww, ws*ws*c) tokens -> (BN, h, w, c) map (strided lattice)."""
    return _merge_impl(t, ws, h, w, interpret)


def _merge_fwd(t, ws, h, w, interpret):
    return _merge_impl(t, ws, h, w, interpret), None


def _merge_bwd(ws, h, w, interpret, _, ct):
    return (_split_impl(ct, ws, interpret),)


lattice_merge_op.defvjp(_merge_fwd, _merge_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def lattice_split_op(x, ws: int, interpret: bool = False):
    """(BN, h, w, c) map -> (BN, hh*ww, ws*ws*c) tokens (strided lattice)."""
    return _split_impl(x, ws, interpret)


def _split_fwd(x, ws, interpret):
    return _split_impl(x, ws, interpret), (x.shape[1], x.shape[2])


def _split_bwd(ws, interpret, res, ct):
    h, w = res
    return (_merge_impl(ct, ws, h, w, interpret),)


lattice_split_op.defvjp(_split_fwd, _split_bwd)
