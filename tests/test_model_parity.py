"""Golden-value parity: full Turtle forward vs the executed PyTorch
reference, in float64, threading the KV caches over several frames exactly
like the reference train/eval loops (video_restoration_model.py:78-129)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from turtlevsr_tpu.config.options import model_config_from_options
from turtlevsr_tpu.io.torch_convert import params_from_torch_state_dict
from turtlevsr_tpu.models.turtle import forward, init_cache

from reference_oracle import build_reference_model, tiny_opt

ATOL = 1e-9


class _KeepF64:
    """The reference forward calls ``inp_img.float()`` (turtle_arch.py:987);
    for the fp64 oracle run we make that a no-op so the whole pipeline stays
    double precision."""

    def __enter__(self):
        orig = self._orig = torch.Tensor.float
        # only skip the downcast for float64 tensors; integer tensors (the
        # local-mask coords) still need the real cast
        torch.Tensor.float = lambda t: t if t.dtype == torch.float64 else orig(t)
        return self

    def __exit__(self, *exc):
        torch.Tensor.float = self._orig


def run_reference(model, frames):
    """frames: (T, B, C, H, W) torch tensors; returns list of outputs."""
    outs = []
    k_cache, v_cache = None, None
    with torch.no_grad(), _KeepF64():
        for t in range(frames.shape[0]):
            cur = frames[t].unsqueeze(1)
            prev = frames[max(t - 1, 0)].unsqueeze(1)
            x = torch.concat([prev, cur], dim=1)  # (B, 2, C, H, W)
            out, k_cache, v_cache = model(x, k_cache, v_cache)
            outs.append(out.numpy())
    return outs


def run_ours(params, cfg, frames_np):
    """frames_np: (T, B, C, H, W) float64; returns list of NCHW outputs."""
    import jax

    t_total, b, c, h, w = frames_np.shape
    cache = init_cache(cfg, b, h, w, dtype=jnp.float64)
    step = jax.jit(lambda p, x, c_: forward(p, cfg, x, c_))
    outs = []
    for t in range(t_total):
        cur = frames_np[t].transpose(0, 2, 3, 1)
        prev = frames_np[max(t - 1, 0)].transpose(0, 2, 3, 1)
        x = jnp.asarray(np.stack([prev, cur], axis=1))  # (B,2,H,W,C)
        out, cache = step(params, x, cache)
        outs.append(np.asarray(out).transpose(0, 3, 1, 2))
    return outs


def _compare(model_name, h, w, n_frames=4, batch=2, **overrides):
    opt = tiny_opt(model_name, **overrides)
    ref = build_reference_model(opt)
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float64)

    rng = np.random.RandomState(42)
    frames = rng.rand(n_frames, batch, 3, h, w)
    want = run_reference(ref, torch.from_numpy(frames))
    got = run_ours(params, cfg, frames)

    for t, (w_, g_) in enumerate(zip(want, got)):
        assert g_.shape == w_.shape, f"frame {t}: {g_.shape} vs {w_.shape}"
        np.testing.assert_allclose(g_, w_, atol=ATOL,
                                   err_msg=f"frame {t} mismatch")


def test_t1_multi_frame_parity():
    _compare("Turtle_t1_arch", 64, 64)


def test_t0_multi_frame_parity():
    _compare("Turtle_arch", 64, 64)


def test_sr_multi_frame_parity():
    _compare("Turtlesuper_t1_arch", 16, 16, n_frames=3, batch=1)


def test_t1_non_multiple_of_32_padding():
    # exercises check_image_size padding (turtle_arch.py:1058-1063)
    _compare("Turtle_t1_arch", 40, 72, n_frames=2, batch=1)


def test_t1_use_both_input():
    _compare("Turtle_t1_arch", 64, 64, n_frames=2, batch=1,
             use_both_input=True)


def test_cache_overflow_beyond_ring():
    # more frames than num_frames_tocache=2 exercises the ring wrap
    _compare("Turtle_t1_arch", 64, 64, n_frames=5, batch=1)
