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

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 72 * 1024 * 1024


def _sparse_softmax_rows(s, m, k_top: int):
    """The shared fp32 row body: top-k keep (running max, first-occurrence
    tie-break, exactly ops/attn_utils.topk_keep) + local mask combine +
    zero-ignoring clipped softmax (turtle_arch.py:115-135). s, m: (R, K)
    fp32."""
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
    return e / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)


def _kernel(s_ref, m_ref, out_ref, *, k_top: int):
    s = s_ref[0].astype(jnp.float32)  # (R, K)
    m = m_ref[0].astype(jnp.float32)
    out_ref[0] = _sparse_softmax_rows(s, m, k_top).astype(out_ref.dtype)


def _local_mask_rows(row0, r, hwk, wq: int, n: int):
    """(r, hwk) fp32 local-attention mask computed from iotas: L1 grid
    distance <= n between query tokens [row0, row0+r) and all hwk keys on
    the (hq, wq) window grid (turtle_arch.py:441-457) — replaces a
    (HW, HW) fp32 mask INPUT (54 MB at 720p, re-streamed from HBM for
    every (frame, q-chunk) grid step: ~162 MB/frame) with a few VPU ops
    on register-resident iotas (div/rem lowerings proven in-kernel by
    _col_wrap_masks)."""
    qidx = row0 + jax.lax.broadcasted_iota(jnp.int32, (r, hwk), 0)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (r, hwk), 1)
    wq_ = jnp.int32(wq)
    dy = jnp.abs(qidx // wq_ - kidx // wq_)
    dx = jnp.abs(jax.lax.rem(qidx, wq_) - jax.lax.rem(kidx, wq_))
    return (dy + dx <= n).astype(jnp.float32)


def _scores_kernel(q_ref, kt_ref, temp_ref, fv_ref, out_ref, *,
                   k_top: int, nf: int, round_dtype, r: int, wq: int,
                   n_local: int):
    """Fused scores + top-k + local-mask + clipped softmax for one q chunk
    of one (batch, frame): s = (q @ k^T) * temperature on the MXU, then the
    sparse-softmax chain of _kernel — the (NF, HW, HW) fp32 score tensor
    never exists in HBM (the XLA chain writes + rereads it twice), and the
    local mask is derived from iotas in-kernel (_local_mask_rows). The
    per-frame validity scalar multiplies the probabilities in-kernel
    (free VPU op): invalid ring frames emit all-zero attention rows, so
    their @v output maps are exactly zero and the downstream full-map
    fvalid multiply (turtle_t1_arch.py:607 zeroing) can be skipped."""
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * temp_ref[0, 0]
    # match the XLA path bit-for-bit: scores are rounded to the model dtype
    # before the sparse softmax (sab_t1_apply: attn.astype(x.dtype))
    s = s.astype(round_dtype).astype(jnp.float32)
    m = _local_mask_rows(pl.program_id(1) * r, r, s.shape[1], wq, n_local)
    # whole (1, nf) row lives in SMEM (TPU block specs need block == array
    # for sub-(8,128) shapes); the frame scalar is a dynamic SMEM load
    fv = fv_ref[0, jax.lax.rem(pl.program_id(0), jnp.int32(nf))]
    probs = _sparse_softmax_rows(s, m, k_top) * fv
    out_ref[0] = probs.astype(out_ref.dtype)


def sab_fused_attn_probs(q, kt, grid_wq, temp, fvalid=None,
                         k_top: int = 5, n_local: int = 4,
                         interpret: bool = False):
    """q: (B, HWq, D); kt: (B, NF, D, HWk) (keys pre-transposed, both
    l2-normalised); grid_wq: static width of the (hq, wq) window grid
    (the local mask is computed in-kernel from it); temp: () temperature;
    fvalid: optional (NF,) per-frame validity — folded into the
    probabilities in-kernel (invalid frames get all-zero rows). Returns
    (B, NF, HWq, HWk) attention probabilities in q.dtype with the
    reference's top-k + local + clipped-softmax semantics
    (turtle_t1_arch.py:588-596)."""
    b, hwq, d = q.shape
    nf, hwk = kt.shape[1], kt.shape[3]
    if int(grid_wq) <= 0:
        raise ValueError(f"grid_wq must be a positive static ({grid_wq})")
    if hwq != hwk:
        # _local_mask_rows places queries AND keys on the same (hq, wq)
        # grid; a differing key grid would get a silently wrong mask
        # (ADVICE r4). All t1 call sites have hwq == hwk.
        raise ValueError(f"query/key token grids differ ({hwq} vs {hwk}); "
                         "the in-kernel local mask assumes one grid")
    r = _pick_rows(hwq, hwk)
    grid = (b * nf, hwq // r)
    temp2 = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    if fvalid is None:
        fv = jnp.ones((1, nf), jnp.float32)
    else:
        fv = jnp.asarray(fvalid, jnp.float32).reshape(1, nf)
    return pl.pallas_call(
        functools.partial(_scores_kernel, k_top=k_top, nf=nf,
                          round_dtype=q.dtype, r=r, wq=int(grid_wq),
                          n_local=n_local),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, d), lambda bn, i, nf=nf: (bn // nf, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, hwk),
                         lambda bn, i, nf=nf: (bn // nf, bn % nf, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bn, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nf), lambda bn, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, r, hwk), lambda bn, i: (bn, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nf, hwq, hwk), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, kt, temp2, fv).reshape(b, nf, hwq, hwk)


def _av_kernel(a_ref, v_ref, out_ref):
    out_ref[0, 0] = jnp.dot(a_ref[0], v_ref[0],
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _av_pair_kernel(a_ref, v_ref, e0, e1, oe_ref, oo_ref):
    """c_slot == 64: the 128-lane v block is a PAIR of adjacent slots; the
    pair matmul keeps the MXU full (N=128) and the two slot halves are
    separated afterwards with constant 0/1 selection matmuls (in-kernel
    64-lane slicing is a Mosaic hang trigger; selection by matmul is exact —
    each output element is a single-term sum — and commutes with the bf16
    cast)."""
    pair = jnp.dot(a_ref[0], v_ref[0],
                   preferred_element_type=jnp.float32).astype(oe_ref.dtype)
    oe_ref[0, 0] = jnp.dot(pair, e0[:], preferred_element_type=jnp.float32
                           ).astype(oe_ref.dtype)
    oo_ref[0, 0] = jnp.dot(pair, e1[:], preferred_element_type=jnp.float32
                           ).astype(oo_ref.dtype)


def _av_rows(hw: int) -> int:
    """Largest divisor of hw keeping the a-block within ~32MB (the 4x
    covers double-buffering of the two blocked operands; elements counted
    at 2 bytes — a arrives in the model dtype, bf16 on the bench path)."""
    best = 8
    for r in range(8, hw + 1):
        if hw % r == 0 and 4 * r * hw * 2 <= 32 * 1024 * 1024:
            best = r
    return best


def sab_av_slots_supported(hw: int, d: int, c_slot: int) -> bool:
    if hw % 8 or d % c_slot:
        return False
    if c_slot == 64:
        # the pair kernel walks D in 128-lane (slot-pair) blocks: an odd
        # slot count (odd ws with c=64) would silently drop the last slot
        return d % 128 == 0
    return c_slot % 128 == 0


def sab_attn_v_slots(a, v, c_slot: int, interpret: bool = False):
    """Slot-tiled attention @ values: a (BN, HW, HW) probabilities, v
    (BN, HW, D) lattice-layout window values with D = n_slots * c_slot
    (feature order (p1, p2, c) — turtle_arch.py:487-492). Returns
    (BN, n_slots, HW, c_slot) with out[s] = a @ v[..., s*c:(s+1)*c].

    Identical math to the dense einsum, but the slot-major OUTPUT layout
    makes the downstream lattice merge (turtle_t1_arch.py:601-607) a
    coarse-grained transpose: (HW, c) rows reshape FREELY to the (hh, ww*c)
    map tile, so the merge moves contiguous ww*c-element runs instead of
    c-element runs (XLA's 6-D fine-grained transpose runs ~4x off
    bandwidth; the coarse one rides at memcpy speed)."""
    bn, hw, d = v.shape
    r = _av_rows(hw)
    if c_slot >= 128:
        n_slots = d // c_slot
        grid = (bn, hw // r, n_slots)
        return pl.pallas_call(
            _av_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, r, hw), lambda b, q, s: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hw, c_slot), lambda b, q, s: (b, 0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, r, c_slot),
                                   lambda b, q, s: (b, s, q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bn, n_slots, hw, c_slot),
                                           a.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                # q/s sequential: the a-block's index map is constant across
                # the inner s steps, so Mosaic keeps it resident instead of
                # re-fetching 13.5MB per slot
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(a, v)
    # c_slot == 64: pair mode
    assert c_slot == 64
    n_pairs = d // 128
    e = np.zeros((128, 128), np.float32)
    e[np.arange(128), np.arange(128)] = 1.0
    e0 = jnp.asarray(e[:, :64], a.dtype)
    e1 = jnp.asarray(e[:, 64:], a.dtype)
    grid = (bn, hw // r, n_pairs)
    oe, oo = pl.pallas_call(
        _av_pair_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, hw), lambda b, q, s: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 128), lambda b, q, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, r, 64), lambda b, q, s: (b, s, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r, 64), lambda b, q, s: (b, s, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bn, n_pairs, hw, 64), a.dtype),
            jax.ShapeDtypeStruct((bn, n_pairs, hw, 64), a.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(a, v, e0, e1)
    return oe, oo


def sab_attn_v_merge(a, v, ws: int, h: int, w: int,
                     interpret: bool = False):
    """attention @ window-values followed by the lattice un-split, fused:
    a (BN, HW, HW), v (BN, HW, ws*ws*c) -> merged maps (BN, h, w, c).

    Exactly einsum('bqk,bkd->bqd') + the reference merge
    rearrange('b (hh ww) (p1 p2 c) -> b (p1 hh) (p2 ww) c'
    (turtle_t1_arch.py:601-607) — but via the slot-tiled kernel the merge
    is a pure reshape + coarse transpose (contiguous ww*c runs)."""
    bn, hw, d = v.shape
    c = d // (ws * ws)
    hh, ww = h // ws, w // ws
    if c >= 128:
        out_s = sab_attn_v_slots(a, v, c, interpret)  # (BN, S, HW, c)
        t = out_s.reshape(bn, ws, ws, hh, ww * c).transpose(0, 1, 3, 2, 4)
        return t.reshape(bn, h, w, c)
    # pair mode (c == 64): even/odd slot halves arrive separately; the
    # interleave happens at ww*c-run granularity inside the merge transpose
    oe, oo = sab_attn_v_slots(a, v, c, interpret)
    assert ws % 2 == 0
    me = oe.reshape(bn, ws, ws // 2, hh, ww * c).transpose(0, 1, 3, 2, 4)
    mo = oo.reshape(bn, ws, ws // 2, hh, ww * c).transpose(0, 1, 3, 2, 4)
    t = jnp.stack([me, mo], axis=4)  # (BN, ws, hh, ws//2, 2, ww*c)
    return t.reshape(bn, h, w, c)


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
