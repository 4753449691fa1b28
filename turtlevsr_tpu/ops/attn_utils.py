"""Attention primitives shared by the Turtle block zoo.

Softmax/normalisation run in at least float32 (float64 inputs stay float64
so golden-value parity tests against the fp64 torch reference are exact) and
are written NaN-free so gradients stay clean when ring-buffer cache slots are
still empty (the reference grows its KV caches dynamically from ``None``; we
keep fixed shapes with validity masks — see core/cache.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_NORM_EPS = 1e-12  # torch.nn.functional.normalize default


def acc_dtype(dtype):
    """Accumulation dtype: at least float32, float64 preserved."""
    return jnp.promote_types(dtype, jnp.float32)


def l2_normalize(x, axis: int = -1):
    """torch F.normalize(p=2): x / max(||x||, 1e-12).

    The sqrt argument is made safe for all-zero rows (empty ring-buffer
    cache frames) so gradients stay finite: sqrt'(0) = inf would otherwise
    poison the backward pass with 0 * inf = NaN. Forward values are
    unchanged (zero rows normalise to zero either way)."""
    ad = acc_dtype(x.dtype)
    # reduce in >=fp32 but scale in the input dtype: never materialise an
    # upcast copy of the (possibly huge) token tensor
    ss = jnp.sum(jnp.square(x.astype(ad)), axis=axis, keepdims=True)
    nonzero = ss > 0
    n = jnp.sqrt(jnp.where(nonzero, ss, 1.0))
    n = jnp.where(nonzero, n, 0.0)
    inv = (1.0 / jnp.maximum(n, _NORM_EPS)).astype(x.dtype)
    return x * inv


def masked_softmax(scores, valid=None, axis: int = -1):
    """Softmax in (at least) fp32 with an optional boolean key-validity mask.

    Invalid positions get zero probability; rows with no valid position
    return all-zeros instead of NaN.
    """
    dtype = scores.dtype
    ad = acc_dtype(dtype)
    s = scores.astype(ad)
    if valid is not None:
        s = jnp.where(valid, s, -jnp.inf)
    m = jnp.max(s, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    out = e / jnp.maximum(denom, jnp.finfo(ad).tiny)
    return out.astype(dtype)


def clipped_softmax(combined, axis: int = -1):
    """Softmax that ignores exactly-zero entries (turtle_arch.py:115-135).

    The reference builds a sparse score tensor (top-k scores + local-window
    scores; everything else exactly 0), masks zeros to -inf, softmaxes, and
    renormalises. Renormalisation is a numerical no-op for rows with any
    surviving entry, and all-zero rows (empty cache slots) here produce 0
    rather than the reference's NaN — those rows are masked out downstream
    either way.
    """
    zero_mask = combined == 0
    return masked_softmax(combined, valid=~zero_mask, axis=axis)


def topk_keep(scores, k: int):
    """Zero out everything but the top-k entries of the last axis
    (turtle_t1_arch.py:327-332 zero_out_non_top_k).

    Implemented as k rounds of running-max instead of lax.top_k: for tiny k
    over wide rows, k masked max-reductions are far cheaper on the VPU than
    the sort top_k lowers to. Ties: each round keeps the FIRST occurrence
    of the round's max (torch.topk also returns k distinct positions)."""
    k = min(k, scores.shape[-1])
    n = scores.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape,
                                   scores.ndim - 1)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    remaining = scores
    keep = jnp.zeros(scores.shape, bool)
    for _ in range(k):
        m = jnp.max(remaining, axis=-1, keepdims=True)
        is_max = remaining == m
        # first occurrence only (matches a k-distinct-positions top-k)
        first = idx == jnp.min(jnp.where(is_max, idx, n), axis=-1,
                               keepdims=True)
        hit = is_max & first
        keep = keep | hit
        remaining = jnp.where(hit, neg_inf, remaining)
    return scores * keep.astype(scores.dtype)


@functools.lru_cache(maxsize=64)
def _local_window_mask_np(h: int, w: int, n: int) -> np.ndarray:
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([ys, xs], axis=-1).reshape(-1, 2).astype(np.float64)
    dist = np.abs(coords[:, None, :] - coords[None, :, :]).sum(-1)
    return (dist <= n).astype(np.float32)


def local_window_mask(h: int, w: int, n: int = 4, dtype=jnp.float32):
    """(h*w, h*w) 0/1 mask, L1 distance <= n between token grid coords
    (turtle_arch.py:441-457 create_local_attention_mask)."""
    return jnp.asarray(_local_window_mask_np(h, w, n), dtype)


@functools.lru_cache(maxsize=16)
def _posenc2d_np(d_model: int, height: int, width: int) -> np.ndarray:
    """2D sincos positional encoding, bit-matching turtle_arch.py:412-439."""
    if d_model % 4 != 0:
        raise ValueError(f"posenc2d needs d_model % 4 == 0, got {d_model}")
    pe = np.zeros((d_model, height, width), dtype=np.float64)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    sin_w = np.sin(pos_w * div_term).T[:, None, :]  # (half/2, 1, width)
    cos_w = np.cos(pos_w * div_term).T[:, None, :]
    sin_h = np.sin(pos_h * div_term).T[:, :, None]  # (half/2, height, 1)
    cos_h = np.cos(pos_h * div_term).T[:, :, None]
    pe[0:half:2] = np.repeat(sin_w, height, axis=1)
    pe[1:half:2] = np.repeat(cos_w, height, axis=1)
    pe[half::2] = np.repeat(sin_h, width, axis=2)
    pe[half + 1::2] = np.repeat(cos_h, width, axis=2)
    return pe.transpose(1, 2, 0)  # -> (height, width, d_model), NHWC


def posenc2d(d_model: int, height: int, width: int, dtype=jnp.float32):
    """(height, width, d_model) positional encoding (NHWC layout)."""
    return jnp.asarray(_posenc2d_np(d_model, height, width), dtype)
