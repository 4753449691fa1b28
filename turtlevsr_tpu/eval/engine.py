"""Streaming inference engine: whole-frame and tiled sliding-window modes.

Reference protocol (inference.py:172-246 run_inference_patched,
:260-370 run_inference):
  * frames stream in order; the causal-history cache is threaded frame to
    frame; previous frame = current on the first frame;
  * tiled mode pads H,W to multiples of 8 (reflect), slides a
    ``tile``-sized window with stride ``tile - overlap`` (last window
    snapped to the border), keeps a PER-TILE KV cache, overlap-adds the
    outputs and divides by the coverage count, clamps to [0, 1];
  * SR downsamples inputs x4 (bicubic) before the model.

TPU-native differences: the reference loops tiles in python and round-trips
every tile's cache through CPU each frame (a CUDA-memory workaround,
inference.py:226-237). Here the whole tile grid is ONE batched model call
per frame — tiles ride the batch axis, all caches stay device-resident, and
the gather/overlap-add runs inside the same jit.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from turtlevsr_tpu.config.options import ModelConfig
from turtlevsr_tpu.models.turtle import forward, init_cache
from turtlevsr_tpu.ops.resize import resize_bicubic


def _pad8(h: int, w: int) -> Tuple[int, int]:
    """inference.py:186-188 round-up-to-8 (pads only if not divisible)."""
    hp = ((h + 8) // 8) * 8 if h % 8 else h
    wp = ((w + 8) // 8) * 8 if w % 8 else w
    return hp, wp


def _tile_grid(size: int, tile: int, stride: int):
    """inference.py:200-201: range(0, size - tile, stride) + [size - tile]."""
    idx = list(range(0, size - tile, stride)) + [size - tile]
    return idx


class VideoFrames:
    """Sorted frame-folder reader -> float32 RGB in [0, 1], HWC."""

    def __init__(self, folder: str, pattern: str = "*.*"):
        self.files = sorted(glob.glob(os.path.join(folder, pattern)))
        if not self.files:
            raise FileNotFoundError(f"no frames in {folder}")

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator[np.ndarray]:
        from PIL import Image

        for f in self.files:
            img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            yield img


class InferenceEngine:
    """Stateful streaming restorer for one video.

    Usage:
        eng = InferenceEngine(cfg, params, mode="tiled", tile=320,
                              tile_overlap=128)
        for frame in frames:              # HWC float32 [0,1]
            out = eng.step(frame)         # HWC float32 [0,1]
        eng.reset()                       # before the next video
    """

    def __init__(self, cfg: ModelConfig, params, *, mode: str = "whole",
                 tile: int = 320, tile_overlap: int = 128,
                 dtype=jnp.bfloat16, mesh=None, max_tile_batch: int = 15):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — in tiled
        mode the tile batch (and every per-tile cache) shards across it, so
        one frame's tile grid runs on all chips in parallel (the spatial
        CP-analog of SURVEY.md §2.6; requires n_tiles % n_devices == 0).

        max_tile_batch: on a single chip, big tile grids (720p at the
        reference's tile 320 / overlap 192 is 45 tiles) exceed HBM if run as
        one batch; the grid is processed in lax.map chunks of at most this
        many tiles (caches stay device-resident throughout)."""
        assert mode in ("whole", "tiled")
        self.cfg = cfg
        self.mode = mode
        self.tile = tile
        self.tile_overlap = tile_overlap
        self.dtype = dtype
        self.mesh = mesh
        self.max_tile_batch = max_tile_batch
        self.params = jax.tree.map(
            lambda p: p.astype(dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        self._cache = None
        self._prev = None
        self._step_fn = None
        self._shape = None

    # ------------------------------------------------------------------
    def reset(self):
        self._cache = None
        self._prev = None

    def step(self, frame: np.ndarray) -> np.ndarray:
        """Restore one HWC [0,1] frame, advancing the causal history."""
        return np.asarray(self.step_async(frame), np.float32)

    def step_async(self, frame: np.ndarray):
        """Like step, but returns the DEVICE array (H, W, C, engine dtype)
        without a host sync. Fetching it (np.asarray) blocks until the
        device finishes; dispatching the next step_async first lets host
        postprocessing of this frame overlap the next frame's compute —
        JAX dispatch is async and the cache stays device-resident."""
        h, w, _ = frame.shape
        if self._shape != (h, w):
            self._shape = (h, w)
            self._build(h, w)
            self.reset()
        cur = jnp.asarray(frame, self.dtype)[None]  # (1, H, W, C)
        prev = cur if self._prev is None else self._prev
        if self._cache is None:
            self._cache = self._fresh_cache()
        out, self._cache = self._step_fn(self.params, prev, cur, self._cache)
        self._prev = cur
        return out[0]

    # ------------------------------------------------------------------
    def _fresh_cache(self):
        h, w = self._shape
        cfg = self.cfg
        if self.mode == "whole":
            if cfg.variant == "sr":
                return init_cache(cfg, 1, h // cfg.sr_scale, w // cfg.sr_scale,
                                  dtype=self.dtype)
            return init_cache(cfg, 1, h, w, dtype=self.dtype)
        n_tiles, t = self._grid_size(h, w)
        tin = t // cfg.sr_scale if cfg.variant == "sr" else t
        return init_cache(cfg, n_tiles, tin, tin, dtype=self.dtype)

    def _tile_chunk(self, n_tiles: int) -> int:
        """Chunk size for sequencing the tile grid (mesh mode runs the full
        grid — chips share the batch). Prefers an exact divisor; otherwise
        the grid is zero-padded to a multiple of the chunk, choosing the
        chunk that minimises the padded total — so a prime tile count never
        degenerates to chunk=1 (47 tiles run as 4x12, not 47x1)."""
        if self.mesh is not None or n_tiles <= self.max_tile_batch:
            return n_tiles
        # candidate batches of at least max/2 (small chunks run the MXU
        # under-filled AND multiply dispatch overhead — the prime-count
        # chunk=1 cliff this guards against); among those, least padding
        # waste first (every padded tile is a full discarded forward),
        # then fewest chunks. 45 tiles -> 3x15 exact (measured 0.748 vs
        # 0.739 fps at 5x9 — bigger batches win), 47 -> 4x12.
        lo = self.max_tile_batch // 2 + 1
        return min(range(lo, self.max_tile_batch + 1),
                   key=lambda d: (-(-n_tiles // d) * d, -(-n_tiles // d)))

    def _grid_size(self, h: int, w: int):
        hp, wp = _pad8(h, w)
        t = min(self.tile, hp, wp)
        assert t % 8 == 0, "tile size should be multiple of 8"
        stride = t - self.tile_overlap
        n = len(_tile_grid(hp, t, stride)) * len(_tile_grid(wp, t, stride))
        return n, t

    def _build(self, h: int, w: int):
        cfg = self.cfg

        if self.mode == "whole":

            def step(params, prev, cur, cache):
                if cfg.variant == "sr":
                    prev = resize_bicubic(prev, h // cfg.sr_scale,
                                          w // cfg.sr_scale)
                    cur_in = resize_bicubic(cur, h // cfg.sr_scale,
                                            w // cfg.sr_scale)
                else:
                    cur_in = cur
                x = jnp.stack([prev, cur_in], axis=1)
                out, cache = forward(params, cfg, x, cache)
                return out[:, :h, :w, :], cache

            self._step_fn = jax.jit(step, donate_argnums=(3,))
            return

        hp, wp = _pad8(h, w)
        t = min(self.tile, hp, wp)
        stride = t - self.tile_overlap
        his = _tile_grid(hp, t, stride)
        wis = _tile_grid(wp, t, stride)

        def step(params, prev, cur, cache):
            def pad(fr):
                return jnp.pad(fr, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                               mode="reflect")

            prev_p, cur_p = pad(prev), pad(cur)

            tiles_prev, tiles_cur = [], []
            for hi in his:
                for wi in wis:
                    tiles_prev.append(prev_p[0, hi:hi + t, wi:wi + t, :])
                    tiles_cur.append(cur_p[0, hi:hi + t, wi:wi + t, :])
            tp = jnp.stack(tiles_prev)  # (n_tiles, t, t, C)
            tc = jnp.stack(tiles_cur)
            if cfg.variant == "sr":
                ts = t // cfg.sr_scale
                tp = resize_bicubic(tp, ts, ts)
                tc = resize_bicubic(tc, ts, ts)
            x = jnp.stack([tp, tc], axis=1)
            n_tiles = x.shape[0]
            chunk = self._tile_chunk(n_tiles)
            if chunk == n_tiles:
                outs, cache = forward(params, cfg, x, cache)
            else:
                # sequence the grid through lax.map chunks so one chunk's
                # activations bound peak HBM (all caches stay on device);
                # non-divisor chunks zero-pad the grid (padded tiles are
                # computed and discarded — cheaper than chunk=1 on primes)
                nc = -(-n_tiles // chunk)
                n_pad = nc * chunk
                if n_pad != n_tiles:
                    extra = n_pad - n_tiles

                    def pad_tiles(a):
                        if getattr(a, "ndim", 0) and a.shape[0] == n_tiles:
                            return jnp.concatenate(
                                [a, jnp.zeros((extra,) + a.shape[1:],
                                              a.dtype)], axis=0)
                        return a

                    x = pad_tiles(x)
                    cache = jax.tree.map(pad_tiles, cache)

                xs = x.reshape(nc, chunk, *x.shape[1:])
                cache_c = jax.tree.map(
                    lambda a: a.reshape(nc, chunk, *a.shape[1:])
                    if getattr(a, "ndim", 0) and a.shape[0] == n_pad
                    else jnp.broadcast_to(a, (nc,) + a.shape), cache)

                def one(chunk_args):
                    xc, cc = chunk_args
                    return forward(params, cfg, xc, cc)

                outs_c, cache_c = jax.lax.map(one, (xs, cache_c))
                outs = outs_c.reshape(n_pad, *outs_c.shape[2:])[:n_tiles]
                cache = jax.tree.map(
                    lambda a: (a.reshape(n_pad, *a.shape[2:])[:n_tiles]
                               if a.ndim >= 2 and a.shape[0] == nc
                               and a.shape[1] == chunk else a[0]), cache_c)

            e = jnp.zeros((hp, wp, cur.shape[-1]), jnp.float32)
            wgt = jnp.zeros((hp, wp, 1), jnp.float32)
            k = 0
            for hi in his:
                for wi in wis:
                    e = e.at[hi:hi + t, wi:wi + t, :].add(
                        outs[k].astype(jnp.float32))
                    wgt = wgt.at[hi:hi + t, wi:wi + t, :].add(1.0)
                    k += 1
            restored = jnp.clip(e / wgt, 0.0, 1.0)
            return restored[None, :h, :w, :].astype(cur.dtype), cache

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_tiles = len(his) * len(wis)
            ndev = self.mesh.devices.size
            assert n_tiles % ndev == 0, (
                f"{n_tiles} tiles not divisible over {ndev} devices")
            repl = NamedSharding(self.mesh, P())

            def cache_sh(x):
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_tiles:
                    return NamedSharding(self.mesh, P("data"))
                return repl

            cache0 = self._fresh_cache()
            cache_shardings = jax.tree.map(cache_sh, cache0)
            self._step_fn = jax.jit(
                step,
                in_shardings=(repl, repl, repl, cache_shardings),
                out_shardings=(repl, cache_shardings),
                donate_argnums=(3,))
        else:
            self._step_fn = jax.jit(step, donate_argnums=(3,))
