"""Space<->depth resizers and PyTorch-exact interpolation.

pixel_(un)shuffle reproduce torch.nn.PixelShuffle/PixelUnshuffle channel
ordering (used by the reference's Downsample/Upsample, turtle_arch.py:139-157)
with pure reshapes/transposes — free on TPU after XLA layout assignment.

upsample_bilinear / resize_bicubic reproduce torch.nn.functional.interpolate
(align_corners=False, no antialias; bicubic a=-0.75, which also matches
cv2.INTER_CUBIC used for the SR dataset's /4 LQ synthesis,
video_super_image_dataset.py:129-135). They are implemented as two separable
dense (out, in) weight matmuls — small matrices, MXU-friendly, and exactly
reproducible, unlike jax.image.resize whose cubic kernel uses a=-0.5.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def pixel_unshuffle(x, r: int = 2):
    """NHWC equivalent of torch.nn.PixelUnshuffle(r):
    out[..., c*r*r + i*r + j] = in[h*r+i, w*r+j, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, H, W, c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x, r: int = 2):
    """NHWC equivalent of torch.nn.PixelShuffle(r)."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


def _linear_kernel(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.maximum(0.0, 1.0 - t)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch/cv2 use a=-0.75."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int, kind: str) -> np.ndarray:
    """Dense (n_out, n_in) interpolation matrix, half-pixel convention,
    border-replicated taps, no antialias (torch interpolate defaults)."""
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    if kind == "linear":
        taps, kern = 2, _linear_kernel
        base = np.floor(src)
        offs = np.arange(0, 2, dtype=np.float64)
    elif kind == "cubic":
        taps, kern = 4, _cubic_kernel
        base = np.floor(src) - 1.0
        offs = np.arange(0, 4, dtype=np.float64)
    else:
        raise ValueError(kind)
    idx = base[:, None] + offs[None, :]  # (n_out, taps)
    w = kern(src[:, None] - idx)  # (n_out, taps)
    w = w / w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, n_in - 1).astype(np.int64)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for t in range(taps):
        np.add.at(mat, (dst.astype(np.int64), idx[:, t]), w[:, t])
    return mat


def _resize_separable(x, out_h: int, out_w: int, kind: str):
    b, h, w, c = x.shape
    mh = jnp.asarray(_resize_matrix(h, out_h, kind), x.dtype)
    mw = jnp.asarray(_resize_matrix(w, out_w, kind), x.dtype)
    y = jnp.einsum("Oh,bhwc->bOwc", mh, x)
    y = jnp.einsum("Ow,bhwc->bhOc", mw, y)
    return y


def upsample_bilinear(x, scale: int):
    """torch.nn.Upsample(scale_factor=scale, mode='bilinear',
    align_corners=False) on NHWC (turtlesuper_t1_arch.py:975-977)."""
    b, h, w, c = x.shape
    return _resize_separable(x, h * scale, w * scale, "linear")


def resize_bicubic(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='bicubic', align_corners=False) on NHWC.

    Used for the SR input pipeline's /4 downsample (inference.py:214-220,
    video_super_image_dataset.py:129-135)."""
    return _resize_separable(x, out_h, out_w, "cubic")
