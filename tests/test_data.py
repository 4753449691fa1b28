"""Data pipeline tests on a synthetic frame-folder dataset."""

import os

import numpy as np
import pytest

from turtlevsr_tpu.data import (
    EnlargedSampler,
    PrefetchLoader,
    VideoImageDataset,
    VideoSuperImageDataset,
)


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("DAVIS_root")
    rng = np.random.RandomState(0)
    for sub in ("gt", "blur"):
        for v in range(2):
            d = root / sub / f"video{v}"
            d.mkdir(parents=True)
            for f in range(8):
                img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"{f:05d}.png")
    return str(root)


def _opt(dataroot, **kw):
    opt = {
        "n_sequence": 5, "n_colors": 3, "rgb_range": 1, "patch_size": 48,
        "no_augment": False, "size_must_mode": 4, "manual_seed": 7,
        "dir_data": [dataroot],
        "datasets": {"val": {"dir_data": [dataroot]}},
    }
    opt.update(kw)
    return opt


def test_video_dataset_train_shapes(dataroot):
    ds = VideoImageDataset(_opt(dataroot), "train")
    # 2 videos x (8 - 5 + 1) windows
    assert len(ds) == 8
    item = ds[0]
    assert item["lq"].shape == (5, 48, 48, 3)
    assert item["gt"].shape == (5, 48, 48, 3)
    assert item["lq"].dtype == np.float32
    assert 0.0 <= item["gt"].min() and item["gt"].max() <= 1.0
    assert len(item["key"]) == 5


def test_davis_noise_applied(dataroot):
    # the tmp root contains "DAVIS" => noise synthesis path triggers
    assert "DAVIS" in dataroot
    ds = VideoImageDataset(_opt(dataroot, no_augment=True), "train")
    item = ds[0]
    # with noise, lq != gt even though the synthetic gt/blur files are
    # pixel-identical... they are different random images here, so instead
    # check noise changes lq between two reads of the same index
    a = ds[1]["lq"]
    b = ds[1]["lq"]
    assert np.abs(a - b).max() > 0  # fresh noise each read


def test_val_dataset_full_frames(dataroot):
    ds = VideoImageDataset(_opt(dataroot), "val")
    item = ds[0]
    assert item["gt"].shape == (5, 64, 80, 3)


def test_sr_dataset(dataroot):
    ds = VideoSuperImageDataset(_opt(dataroot, patch_size=48), "train")
    item = ds[0]
    assert item["lq"].shape == (5, 12, 12, 3)
    assert item["gt"].shape == (5, 48, 48, 3)


def test_sampler_deterministic_and_disjoint():
    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=2)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    a, b = list(s0), list(s1)
    assert len(a) == len(b) == 10
    s0b = EnlargedSampler(10, 2, 0, ratio=2)
    s0b.set_epoch(3)
    assert list(s0b) == a  # same epoch -> same order


def test_prefetch_loader_batches(dataroot):
    ds = VideoImageDataset(_opt(dataroot), "train")
    sampler = EnlargedSampler(len(ds), 1, 0)
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["lq"].shape == (2, 5, 48, 48, 3)

def test_prefetch_iter_order_errors_and_break():
    from turtlevsr_tpu.data.loader import prefetch_iter

    # order-preserving passthrough
    assert list(prefetch_iter(range(20), depth=3)) == list(range(20))

    # producer exceptions re-raise at the consumer
    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for x in prefetch_iter(boom()):
            got.append(x)
    assert got == [1, 2]

    # breaking out mid-stream doesn't deadlock the producer
    for x in prefetch_iter(iter(range(1000)), depth=2):
        if x == 3:
            break

    # depth < 1 would mean an UNBOUNDED queue (Queue(0)) — rejected
    with pytest.raises(ValueError, match="depth"):
        next(prefetch_iter(range(3), depth=0))
