"""FramePack native reader tests."""

import os

import numpy as np
import pytest

from turtlevsr_tpu.data.framepack import (
    FramePack,
    FramePackDataset,
    _build_lib,
    pack_frames,
    pack_video_root,
)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    from PIL import Image

    wd = tmp_path_factory.mktemp("fp")
    root = wd / "data"
    rng = np.random.RandomState(0)
    frames = {}
    for side in ("gt", "blur"):
        d = root / side / "vid0"
        d.mkdir(parents=True)
        frames[side] = []
        for f in range(6):
            img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{f:05d}.png")
            frames[side].append(img)
    out = wd / "packs"
    pack_video_root(str(root), str(out))
    return wd, out, frames


def test_native_lib_builds():
    assert _build_lib() is not None, "g++ build of framepack.cc failed"


def test_pack_read_roundtrip(packed):
    wd, out, frames = packed
    p = FramePack(str(out / "gt" / "vid0.pack"))
    assert p.n == 6 and (p.h, p.w, p.c) == (48, 56, 3)
    clip = p.read_clip(1, 3, 0, 0, 48, 56)
    for j in range(3):
        np.testing.assert_array_equal(clip[j], frames["gt"][1 + j])


def test_pack_cropped_read(packed):
    wd, out, frames = packed
    p = FramePack(str(out / "blur" / "vid0.pack"))
    clip = p.read_clip(2, 2, 5, 7, 16, 24)
    for j in range(2):
        np.testing.assert_array_equal(clip[j],
                                      frames["blur"][2 + j][5:21, 7:31])


def test_framepack_dataset(packed):
    wd, out, frames = packed
    opt = {"n_sequence": 3, "patch_size": 16, "rgb_range": 1,
           "no_augment": False, "manual_seed": 1, "dir_data": [str(out)],
           "datasets": {"val": {"dir_data": [str(out)]}}}
    ds = FramePackDataset(opt, "train")
    assert len(ds) == 4  # 6 - 3 + 1
    item = ds[0]
    assert item["lq"].shape == (3, 16, 16, 3)
    assert item["gt"].shape == (3, 16, 16, 3)
    assert 0 <= item["gt"].min() and item["gt"].max() <= 1

    val = FramePackDataset(opt, "val")
    item = val[1]
    assert item["gt"].shape == (3, 48, 56, 3)
    np.testing.assert_allclose(item["gt"][0],
                               frames["gt"][1].astype(np.float32) / 255)
