"""Frame-folder video datasets (host-side, numpy, torch-free).

Mirrors basicsr/data/video_image_dataset.py and
video_super_image_dataset.py: directory layout ``root/{gt,blur}/video/
frame``, sliding windows of ``n_sequence`` frames, one joint random crop +
size_must_mode trim + 8-mode augmentation per clip, on-the-fly gaussian
noise for paths containing "DAVIS" (sigma ~ U[20,50]/255 per frame in
training, fixed 50/255 in validation — video_image_dataset.py:89-112), and
the SR variant's LQ synthesis by cv2 INTER_CUBIC /4 at load
(video_super_image_dataset.py:128-134).

Outputs are NHWC float32 clips scaled by rgb_range (dict with 'lq', 'gt',
'key'); the trainer stacks them to (B, T, H, W, C).
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from turtlevsr_tpu.data.transforms import get_patch, random_augmentation


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


class _FrameFolderBase:
    def __init__(self, opt: dict, phase: str):
        self.opt = opt
        self.phase = phase
        self.n_seq = int(opt["n_sequence"])
        self.n_colors = int(opt.get("n_colors", 3))
        self.rgb_range = float(opt.get("rgb_range", 1))
        self.patch_size = int(opt.get("patch_size", 192))
        self.no_augment = bool(opt.get("no_augment", False))
        self.size_must_mode = int(opt.get("size_must_mode", 1))

        if phase == "train":
            roots = opt["dir_data"]
        else:
            roots = opt["datasets"]["val"]["dir_data"]
        if not isinstance(roots, (list, tuple)):
            roots = [roots]

        self.images_gt: List[List[str]] = []
        self.images_input: List[List[str]] = []
        self.n_frames_video: List[int] = []
        for root in roots:
            gt_videos = sorted(glob.glob(os.path.join(root, "gt", "*")))
            in_videos = sorted(glob.glob(os.path.join(root, self._lq_dir(),
                                                      "*")))
            assert len(gt_videos) == len(in_videos), (
                f"gt/{self._lq_dir()} video count mismatch under {root}")
            for gv, iv in zip(gt_videos, in_videos):
                g = sorted(glob.glob(os.path.join(gv, "*")))
                i = sorted(glob.glob(os.path.join(iv, "*")))
                self.images_gt.append(g)
                self.images_input.append(i)
                self.n_frames_video.append(len(g))
        self.num_video = len(self.images_gt)
        self.num_frame = (sum(self.n_frames_video)
                          - (self.n_seq - 1) * len(self.n_frames_video))
        self._rng = np.random.RandomState(
            int(opt.get("manual_seed", 0)) or None)

    def _lq_dir(self) -> str:
        return "blur"

    def __len__(self):
        return self.num_frame

    def _locate(self, idx: int):
        idx = idx % self.num_frame
        for v, n in enumerate(self.n_frames_video):
            poss = n - self.n_seq + 1
            if idx < poss:
                return v, idx
            idx -= poss
        raise IndexError


class VideoImageDataset(_FrameFolderBase):
    """Deblur/derain/desnow/denoise clips (video_image_dataset.py:9-186)."""

    def _add_noise(self, img_255: np.ndarray) -> np.ndarray:
        if self.phase == "train":
            r1, r2 = 20.0 / 255.0, 50.0 / 255.0
            stdn = self._rng.rand() * (r2 - r1) + r1
        else:
            stdn = 50.0 / 255.0
        noise = self._rng.normal(0.0, stdn, img_255.shape)
        return (noise + img_255 / 255.0) * 255.0

    def __getitem__(self, idx: int) -> dict:
        v, f = self._locate(idx)
        gt_paths = self.images_gt[v][f:f + self.n_seq]
        in_paths = self.images_input[v][f:f + self.n_seq]
        gts = [_imread(p).astype(np.float64) for p in gt_paths]
        lqs = [_imread(p).astype(np.float64) for p in in_paths]

        # one joint crop across the clip (frames channel-concatenated in the
        # reference, video_image_dataset.py:114-122)
        if self.phase == "train":
            lq_cat = np.concatenate(lqs, axis=2)
            gt_cat = np.concatenate(gts, axis=2)
            lq_cat, gt_cat = get_patch(self._rng, lq_cat, gt_cat,
                                       patch_size=self.patch_size)
            m = self.size_must_mode
            h, w = lq_cat.shape[:2]
            lq_cat = lq_cat[: h - h % m, : w - w % m]
            gt_cat = gt_cat[: h - h % m, : w - w % m]
            if not self.no_augment:
                lq_cat, gt_cat = random_augmentation(self._rng, lq_cat, gt_cat)
            c = self.n_colors
            lqs = [lq_cat[..., i * c:(i + 1) * c] for i in range(self.n_seq)]
            gts = [gt_cat[..., i * c:(i + 1) * c] for i in range(self.n_seq)]

        out_lq = []
        for path, img in zip(in_paths, lqs):
            if "DAVIS" in path:
                out_lq.append(self._add_noise(img))
            else:
                out_lq.append(img)

        scale = self.rgb_range / 255.0
        lq = np.stack(out_lq).astype(np.float32) * scale
        gt = np.stack(gts).astype(np.float32) * scale
        key = [os.path.split(os.path.dirname(p))[-1] + "."
               + os.path.splitext(os.path.basename(p))[0] for p in gt_paths]
        return {"lq": lq, "gt": gt, "key": key}


class VideoSuperImageDataset(_FrameFolderBase):
    """4x SR clips: GT full-res, LQ bicubic /4 at load
    (video_super_image_dataset.py)."""

    SCALE = 4

    def __getitem__(self, idx: int) -> dict:
        import cv2

        v, f = self._locate(idx)
        gt_paths = self.images_gt[v][f:f + self.n_seq]
        in_paths = self.images_input[v][f:f + self.n_seq]
        gts = [_imread(p) for p in gt_paths]
        lqs = []
        for p in in_paths:
            img = _imread(p)
            h, w = img.shape[:2]
            lqs.append(cv2.resize(img, (w // self.SCALE, h // self.SCALE),
                                  interpolation=cv2.INTER_CUBIC))

        lq_seq = np.stack([a.astype(np.float64) for a in lqs])
        gt_seq = np.stack([a.astype(np.float64) for a in gts])

        if self.phase == "train":
            # joint (LR patch, 4x HR patch) crop + augmentation
            # (video_super_image_dataset.py:152-164); LR patch = patch//4
            ps = self.patch_size // self.SCALE
            t, ih, iw, c = lq_seq.shape
            lr_flat = lq_seq.transpose(1, 2, 0, 3).reshape(ih, iw, t * c)
            hh, hw = gt_seq.shape[1:3]
            hr_flat = gt_seq.transpose(1, 2, 0, 3).reshape(hh, hw, t * c)
            lr_flat, hr_flat = get_patch(self._rng, lr_flat, hr_flat,
                                         patch_size=ps, scale=self.SCALE)
            lr_flat, hr_flat = random_augmentation(self._rng, lr_flat, hr_flat) \
                if not self.no_augment else (lr_flat, hr_flat)
            lq_seq = lr_flat.reshape(ps, ps, t, c).transpose(2, 0, 1, 3)
            hp = ps * self.SCALE
            gt_seq = hr_flat.reshape(hp, hp, t, c).transpose(2, 0, 1, 3)

        scale = self.rgb_range / 255.0
        key = [os.path.split(os.path.dirname(p))[-1] + "."
               + os.path.splitext(os.path.basename(p))[0] for p in gt_paths]
        return {"lq": lq_seq.astype(np.float32) * scale,
                "gt": gt_seq.astype(np.float32) * scale,
                "key": key}


def create_dataset(opt: dict, phase: str):
    """Registry by task: the reference selects the SR dataset by a manual
    import swap in train.py:24-28 (readme.md:106-112); here it keys off the
    option file's model/type."""
    model = str(opt.get("model", "")).lower()
    task = str(opt.get("type", "")).lower()
    if "super" in model or "superresolution" in task:
        return VideoSuperImageDataset(opt, phase)
    return VideoImageDataset(opt, phase)
