"""Pallas TPU kernel: the StateAlignBlock sparse-score softmax.

The t1 SAB combines a top-5-per-row sparsification with a local-window
mask and a zero-ignoring softmax (turtle_t1_arch.py:588-596 +
clipped_softmax turtle_arch.py:115-135). In XLA that chain makes ~15
elementwise/reduce passes over the (NF, HW, HW) score tensor; here it is
ONE read + ONE write per row block:

    keep   = top-5 positions of the row (5 rounds of running max,
             first-occurrence tie-break)
    comb   = s * keep + s * local_mask        (== attn1 + attn2)
    out    = softmax over comb's nonzero entries, zeros elsewhere

Rows are independent; the grid walks (batch*frames, row blocks). All math
is fp32 internally regardless of the score dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 72 * 1024 * 1024


def _kernel(s_ref, m_ref, out_ref, *, k_top: int):
    s = s_ref[0].astype(jnp.float32)  # (R, K)
    m = m_ref[0].astype(jnp.float32)
    r, k = s.shape

    idx = jax.lax.broadcasted_iota(jnp.int32, (r, k), 1)
    neg_inf = jnp.float32(-jnp.inf)
    remaining = s
    keep = jnp.zeros((r, k), jnp.float32)
    for _ in range(k_top):
        mx = jnp.max(remaining, axis=-1, keepdims=True)
        is_max = remaining == mx
        first = idx == jnp.min(jnp.where(is_max, idx, k), axis=-1,
                               keepdims=True)
        hit = jnp.where(is_max & first, 1.0, 0.0)
        keep = keep + hit
        remaining = jnp.where(hit > 0, neg_inf, remaining)

    comb = s * keep + s * m
    zero = comb == 0.0
    masked = jnp.where(zero, neg_inf, comb)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    e = jnp.exp(masked - mx)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
    out_ref[0] = out.astype(out_ref.dtype)


def _scores_kernel(q_ref, kt_ref, m_ref, temp_ref, out_ref, *, k_top: int,
                   round_dtype):
    """Fused scores + top-k + local-mask + clipped softmax for one q chunk
    of one (batch, frame): s = (q @ k^T) * temperature on the MXU, then the
    sparse-softmax chain of _kernel — the (NF, HW, HW) fp32 score tensor
    never exists in HBM (the XLA chain writes + rereads it twice)."""
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * temp_ref[0, 0]
    # match the XLA path bit-for-bit: scores are rounded to the model dtype
    # before the sparse softmax (sab_t1_apply: attn.astype(x.dtype))
    s = s.astype(round_dtype).astype(jnp.float32)
    m = m_ref[0].astype(jnp.float32)
    r, k = s.shape

    idx = jax.lax.broadcasted_iota(jnp.int32, (r, k), 1)
    neg_inf = jnp.float32(-jnp.inf)
    remaining = s
    keep = jnp.zeros((r, k), jnp.float32)
    for _ in range(k_top):
        mx = jnp.max(remaining, axis=-1, keepdims=True)
        is_max = remaining == mx
        first = idx == jnp.min(jnp.where(is_max, idx, k), axis=-1,
                               keepdims=True)
        hit = jnp.where(is_max & first, 1.0, 0.0)
        keep = keep + hit
        remaining = jnp.where(hit > 0, neg_inf, remaining)

    comb = s * keep + s * m
    zero = comb == 0.0
    masked = jnp.where(zero, neg_inf, comb)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    e = jnp.exp(masked - mx)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
    out_ref[0] = out.astype(out_ref.dtype)


def sab_fused_attn_probs(q, kt, local_mask, temp, k_top: int = 5,
                         interpret: bool = False):
    """q: (B, HWq, D); kt: (B, NF, D, HWk) (keys pre-transposed, both
    l2-normalised); local_mask: (HWq, HWk); temp: () temperature. Returns
    (B, NF, HWq, HWk) attention probabilities in q.dtype with the
    reference's top-k + local + clipped-softmax semantics
    (turtle_t1_arch.py:588-596)."""
    b, hwq, d = q.shape
    nf, hwk = kt.shape[1], kt.shape[3]
    r = _pick_rows(hwq, hwk)
    grid = (b * nf, hwq // r)
    temp2 = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_scores_kernel, k_top=k_top, round_dtype=q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, d), lambda bn, i, nf=nf: (bn // nf, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, hwk),
                         lambda bn, i, nf=nf: (bn // nf, bn % nf, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, hwk), lambda bn, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bn, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, r, hwk), lambda bn, i: (bn, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nf, hwq, hwk), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, kt, local_mask[None], temp2).reshape(b, nf, hwq, hwk)


def _pick_rows(q: int, k: int) -> int:
    best = 1
    for r in range(1, min(q, 512) + 1):
        if q % r == 0 and r * k * 4 * 8 <= 24 * 1024 * 1024:
            best = r
    return best


def sab_sparse_softmax_supported(q: int, k: int) -> bool:
    return q >= 8 and k >= 128


def sab_sparse_softmax(scores, local_mask, k_top: int = 5,
                       interpret: bool = False):
    """scores: (BN, Q, K); local_mask: (Q, K) 0/1. Returns attention
    probabilities with the reference's top-k + local + clipped-softmax
    semantics."""
    bn, q, k = scores.shape
    r = _pick_rows(q, k)
    grid = (bn, q // r)
    return pl.pallas_call(
        functools.partial(_kernel, k_top=k_top),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, k), lambda b, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, q, k), scores.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(scores, local_mask[None])
