"""Geometric augmentations and patch cropping.

Semantics match basicsr/data/transforms.py:179-236 (8-mode flip/rot90
augmentation; 50% identity else one of modes 1-7) and data_util.py:17-35
(joint random crop).
"""

from __future__ import annotations

import numpy as np


def data_augmentation(image: np.ndarray, mode: int) -> np.ndarray:
    if mode == 0:
        return image
    if mode == 1:
        return np.flipud(image)
    if mode == 2:
        return np.rot90(image)
    if mode == 3:
        return np.flipud(np.rot90(image))
    if mode == 4:
        return np.rot90(image, k=2)
    if mode == 5:
        return np.flipud(np.rot90(image, k=2))
    if mode == 6:
        return np.rot90(image, k=3)
    if mode == 7:
        return np.flipud(np.rot90(image, k=3))
    raise ValueError(f"invalid augmentation mode {mode}")


def random_augmentation(rng: np.random.RandomState, *arrays):
    """transforms.py:226-236: coin-flip identity, else one of modes 1-7
    applied jointly."""
    if rng.randint(0, 2) == 1:
        mode = rng.randint(1, 8)
        return [np.ascontiguousarray(data_augmentation(a, mode))
                for a in arrays]
    return list(arrays)


def get_patch(rng: np.random.RandomState, *arrays, patch_size: int,
              scale: int = 1):
    """data_util.py:17-35: random (patch, scale*patch) joint crop; the first
    array is cropped at LR scale, the rest at scale x."""
    ih, iw = arrays[0].shape[:2]
    ip = patch_size
    tp = scale * ip
    ix = rng.randint(0, iw - ip + 1)
    iy = rng.randint(0, ih - ip + 1)
    tx, ty = scale * ix, scale * iy
    return [arrays[0][iy:iy + ip, ix:ix + ip, ...]] + [
        a[ty:ty + tp, tx:tx + tp, ...] for a in arrays[1:]]


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """transforms.py:10-27."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]
