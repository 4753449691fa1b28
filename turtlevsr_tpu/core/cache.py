"""Fixed-shape ring buffers for the truncated causal-history KV cache.

The reference grows each cache slot from ``None`` by concatenation and then
keeps the trailing ``num_frames_tocache`` frames (turtle_arch.py:273-288,
:499-533). Dynamic shapes don't fit XLA, and on TPU we want the cache to be
the carry of a ``lax.scan`` over time, so each slot is preallocated at its
maximum size with a validity count ``n``:

  * slots hold the newest frame at the END (index N-1 / the last token
    block), so "keep the last N frames" is a shift-left-and-append,
  * positions before ``N - n`` frames are zero-filled and masked out of every
    softmax, which is numerically identical to the reference's shorter
    concatenations (softmax over masked keys == softmax over absent keys).

Slot layout:
  FHR slot: k, v of shape (B, heads, N * ctok, L)  — channel-token cache
            (turtle_arch.py:287-288: ctok = dim // heads tokens per frame)
  SAB slot: k of (B, N, HWq, Dk), v of (B, N, HWv, Dv) — per-frame window
            token caches (frame axis concat, turtle_arch.py:499-501)
Both carry n: int32 scalar, the number of valid cached frames (<= N).
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
    """Append one frame's ctok token block, dropping the oldest."""
    ctok = k_new.shape[2]
    n_total = slot["k"].shape[2]
    if n_total == ctok:  # N == 1: the ring is just the newest frame
        k, v = k_new, v_new
    else:
        k = jnp.concatenate([slot["k"][:, :, ctok:, :], k_new], axis=2)
        v = jnp.concatenate([slot["v"][:, :, ctok:, :], v_new], axis=2)
    n_frames = n_total // ctok
    return {"k": k, "v": v,
            "n": jnp.minimum(slot["n"] + 1, jnp.int32(n_frames))}


def sab_slot_append(slot: dict, k_new, v_new) -> dict:
    """Append one frame (k_new/v_new have no frame axis)."""
    n_frames = slot["k"].shape[1]
    if n_frames == 1:
        k, v = k_new[:, None], v_new[:, None]
    else:
        k = jnp.concatenate([slot["k"][:, 1:], k_new[:, None]], axis=1)
        v = jnp.concatenate([slot["v"][:, 1:], v_new[:, None]], axis=1)
    return {"k": k, "v": v,
            "n": jnp.minimum(slot["n"] + 1, jnp.int32(n_frames))}


def frame_valid_mask(n, n_frames: int):
    """(n_frames,) bool — frame slot i is valid iff i >= n_frames - n."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, 1), 0)[:, 0]
    return idx >= (jnp.int32(n_frames) - n)


def token_valid_mask(n, n_frames: int, block: int):
    """(n_frames * block,) bool — validity of per-frame token blocks."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames * block, 1), 0)[:, 0]
    return idx >= (jnp.int32(n_frames) - n) * block
