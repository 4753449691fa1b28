"""Fixed-shape ring buffers for the truncated causal-history KV cache.

The reference grows each cache slot from ``None`` by concatenation and then
keeps the trailing ``num_frames_tocache`` frames (turtle_arch.py:273-288,
:499-533). Dynamic shapes don't fit XLA, and on TPU we want the cache to be
the carry of a ``lax.scan`` over time, so each slot is preallocated at its
maximum size with a validity count ``n``:

  * each slot is a TRUE ring: the append writes one frame's block in place
    at position ``n % N`` (``jax.lax.dynamic_update_slice``) — a
    shift-and-concat would copy the whole multi-hundred-MB cache every
    frame (~3.7 ms/frame at 720p across the three CHM slots),
  * before overflow, positions n..N-1 are zero-filled and masked out of
    every softmax, which is numerically identical to the reference's
    shorter concatenations (softmax over masked keys == softmax over
    absent keys). After overflow every position is valid. Position order
    is NOT age order — every consumer (per-frame SAB attention, FHR's
    token softmax) is mathematically order-invariant.

Slot layout:
  FHR slot: k, v of shape (B, heads, N * ctok, L)  — channel-token cache
            (turtle_arch.py:287-288: ctok = dim // heads tokens per frame)
  SAB slot: k of (B, N, HWq, Dk), v of (B, N, HWv, Dv) — per-frame window
            token caches (frame axis concat, turtle_arch.py:499-501)
Both carry n: int32 scalar, the TOTAL number of frames ever appended
(write pointer = n % N; min(n, N) positions are valid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fhr_slot_init(batch: int, heads: int, n_frames: int, ctok: int, l: int,
                  dtype=jnp.float32) -> dict:
    shape = (batch, heads, n_frames * ctok, l)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "n": jnp.zeros((), jnp.int32),
    }


def sab_slot_init(batch: int, n_frames: int, hw_q: int, dk: int, hw_v: int,
                  dv: int, dtype=jnp.float32) -> dict:
    return {
        "k": jnp.zeros((batch, n_frames, hw_q, dk), dtype),
        "v": jnp.zeros((batch, n_frames, hw_v, dv), dtype),
        "n": jnp.zeros((), jnp.int32),
    }


def fhr_slot_append(slot: dict, k_new, v_new) -> dict:
    """Write one frame's ctok token block at the ring position."""
    ctok = k_new.shape[2]
    n_frames = slot["k"].shape[2] // ctok
    ptr = (slot["n"] % n_frames) * ctok
    zero = jnp.int32(0)
    k = jax.lax.dynamic_update_slice(slot["k"], k_new, (zero, zero, ptr, zero))
    v = jax.lax.dynamic_update_slice(slot["v"], v_new, (zero, zero, ptr, zero))
    return {"k": k, "v": v, "n": slot["n"] + 1}


def sab_slot_append(slot: dict, k_new, v_new) -> dict:
    """Write one frame (k_new/v_new have no frame axis) at the ring
    position."""
    n_frames = slot["v"].shape[1]
    ptr = slot["n"] % n_frames
    zero = jnp.int32(0)
    k = jax.lax.dynamic_update_slice(slot["k"], k_new[:, None],
                                     (zero, ptr, zero, zero))
    v = jax.lax.dynamic_update_slice(slot["v"], v_new[:, None],
                                     (zero, ptr, zero, zero))
    return {"k": k, "v": v, "n": slot["n"] + 1}


def sab_slot_append_v(slot: dict, v_new) -> dict:
    """Append one frame's V only, leaving the (vestigial) K field as-is.

    The t0 SAB discards its attention scores (``out = v``,
    turtle_arch.py:523, quirk Q1), so the windowed-K cache feeding the
    next frame's equally-dead attention is never read: t0 keeps a tiny
    zero K field purely for pytree-structure stability and skips the
    whole dead qk chain + the ~hundreds-of-MB/frame K ring writes."""
    n_frames = slot["v"].shape[1]
    ptr = slot["n"] % n_frames
    zero = jnp.int32(0)
    v = jax.lax.dynamic_update_slice(slot["v"], v_new[:, None],
                                     (zero, ptr, zero, zero))
    return {"k": slot["k"], "v": v, "n": slot["n"] + 1}


def frame_valid_mask(n, n_frames: int):
    """(n_frames,) bool — ring position i holds a real frame iff i < n."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, 1), 0)[:, 0]
    return idx < n


def token_valid_mask(n, n_frames: int, block: int):
    """(n_frames * block,) bool — validity of per-frame token blocks."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames * block, 1), 0)[:, 0]
    return (idx // jnp.int32(block)) < n
