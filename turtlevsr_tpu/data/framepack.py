"""FramePack — packed-frame dataset format with a native C++ reader.

Replaces the LMDB role in the reference's data stack (lmdb_util.py /
file_client.py; lmdb isn't bundled in this environment anyway) with a
TPU-host-friendly design: frames are decoded ONCE at pack time and stored
raw in a single file; training reads are pure memcpy from an mmap, and a
whole multi-clip batch (gather + joint crop) is a single ctypes call into
``native/framepack.cc`` with one thread per clip.

    pack_video_root(root, out_dir)                   # folder tree -> packs
    ds = FramePackDataset(opt, phase)                # drop-in dataset

Falls back to a pure-numpy mmap reader if the shared library can't be
built (no g++), keeping behaviour identical.
"""

from __future__ import annotations

import ctypes
import glob
import os
import struct
import subprocess
from typing import List, Optional

import numpy as np

_MAGIC = b"TVSRPAK1"
_LIB = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _build_lib() -> Optional[str]:
    src = os.path.join(_native_dir(), "framepack.cc")
    out = os.path.join(_native_dir(), "libframepack.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", src, "-o", out], check=True,
                       capture_output=True)
        return out
    except (OSError, subprocess.CalledProcessError):
        return None


def _lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_lib()
    if path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    lib.framepack_open.restype = ctypes.c_void_p
    lib.framepack_open.argtypes = [ctypes.c_char_p]
    lib.framepack_close.argtypes = [ctypes.c_void_p]
    lib.framepack_count.restype = ctypes.c_uint64
    lib.framepack_count.argtypes = [ctypes.c_void_p]
    lib.framepack_shape.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                    ctypes.POINTER(ctypes.c_uint32)]
    lib.framepack_read_clip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_char_p]
    lib.framepack_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_char_p]
    _LIB = lib
    return lib


def pack_frames(frame_files: List[str], out_path: str) -> int:
    """Pack decoded frames into one .pack file."""
    from PIL import Image

    entries = []
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(frame_files)))
        index_pos = f.tell()
        f.write(b"\0" * (20 * len(frame_files)))
        for path in frame_files:
            img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
            h, w, c = img.shape
            entries.append((f.tell(), h, w, c))
            f.write(np.ascontiguousarray(img).tobytes())
        f.seek(index_pos)
        for off, h, w, c in entries:
            f.write(struct.pack("<QIII", off, h, w, c))
    return len(frame_files)


def pack_video_root(root: str, out_dir: str, sides=("gt", "blur")) -> dict:
    """Pack every `root/<side>/<video>/` folder into `out_dir/<side>/
    <video>.pack`; returns {side: [pack paths]}."""
    result = {}
    for side in sides:
        packs = []
        for vdir in sorted(glob.glob(os.path.join(root, side, "*"))):
            files = sorted(glob.glob(os.path.join(vdir, "*")))
            out = os.path.join(out_dir, side,
                               os.path.basename(vdir) + ".pack")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            pack_frames(files, out)
            packs.append(out)
        result[side] = packs
    return result


class FramePack:
    """One pack file; native reader when available, numpy-mmap fallback."""

    def __init__(self, path: str):
        self.path = path
        lib = _lib()
        self._h = None
        if lib is not None:
            self._h = lib.framepack_open(path.encode())
        if self._h:
            self.n = int(lib.framepack_count(self._h))
            hwc = (ctypes.c_uint32 * 3)()
            lib.framepack_shape(self._h, 0, hwc)
            self.h, self.w, self.c = int(hwc[0]), int(hwc[1]), int(hwc[2])
        else:
            self._mm = np.memmap(path, dtype=np.uint8, mode="r")
            assert bytes(self._mm[:8]) == _MAGIC, f"not a framepack: {path}"
            self.n = int(np.frombuffer(self._mm[8:16].tobytes(), "<u8")[0])
            self._index = np.frombuffer(
                self._mm[16:16 + 20 * self.n].tobytes(),
                dtype=[("off", "<u8"), ("h", "<u4"), ("w", "<u4"),
                       ("c", "<u4")])
            e = self._index[0]
            self.h, self.w, self.c = int(e["h"]), int(e["w"]), int(e["c"])

    def read_clip(self, first: int, t: int, y: int, x: int, ph: int,
                  pw: int) -> np.ndarray:
        out = np.empty((t, ph, pw, self.c), np.uint8)
        if self._h:
            rc = _lib().framepack_read_clip(
                self._h, first, t, y, x, ph, pw,
                out.ctypes.data_as(ctypes.c_char_p))
            assert rc == 0, f"framepack read failed rc={rc}"
            return out
        for j in range(t):
            e = self._index[first + j]
            frame = self._mm[int(e["off"]):int(e["off"])
                             + e["h"] * e["w"] * e["c"]]
            frame = frame.reshape(int(e["h"]), int(e["w"]), int(e["c"]))
            out[j] = frame[y:y + ph, x:x + pw]
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            try:
                _lib().framepack_close(self._h)
            except Exception:
                pass


class FramePackDataset:
    """Drop-in replacement for VideoImageDataset reading .pack files laid
    out as `root/{gt,blur}/<video>.pack` (use pack_video_root to create).

    Same clip semantics: sliding n_sequence windows, joint random crop,
    8-mode augmentation, rgb_range scaling."""

    def __init__(self, opt: dict, phase: str):
        from turtlevsr_tpu.data.transforms import random_augmentation

        self.opt = opt
        self.phase = phase
        self.n_seq = int(opt["n_sequence"])
        self.patch_size = int(opt.get("patch_size", 192))
        self.rgb_range = float(opt.get("rgb_range", 1))
        self.no_augment = bool(opt.get("no_augment", False))
        self._augment = random_augmentation
        roots = (opt["dir_data"] if phase == "train"
                 else opt["datasets"]["val"]["dir_data"])
        if not isinstance(roots, (list, tuple)):
            roots = [roots]
        self.gt_packs, self.lq_packs = [], []
        for root in roots:
            for g in sorted(glob.glob(os.path.join(root, "gt", "*.pack"))):
                b = g.replace(os.sep + "gt" + os.sep,
                              os.sep + "blur" + os.sep)
                self.gt_packs.append(FramePack(g))
                self.lq_packs.append(FramePack(b))
        self.windows = [p.n - self.n_seq + 1 for p in self.gt_packs]
        self.num_frame = sum(self.windows)
        self._rng = np.random.RandomState(int(opt.get("manual_seed", 0))
                                          or None)

    def __len__(self):
        return self.num_frame

    def __getitem__(self, idx: int) -> dict:
        idx = idx % self.num_frame
        for v, n in enumerate(self.windows):
            if idx < n:
                break
            idx -= n
        gt_p, lq_p = self.gt_packs[v], self.lq_packs[v]
        if self.phase == "train":
            ps = self.patch_size
            y = self._rng.randint(0, gt_p.h - ps + 1)
            x = self._rng.randint(0, gt_p.w - ps + 1)
        else:
            y = x = 0
            ps = None
        ph = ps or gt_p.h
        pw = ps or gt_p.w
        gt = gt_p.read_clip(idx, self.n_seq, y, x, ph, pw)
        lq = lq_p.read_clip(idx, self.n_seq, y, x, ph, pw)
        if self.phase == "train" and not self.no_augment:
            t = gt.shape[0]
            cat = np.concatenate([*gt, *lq], axis=2)
            (cat,) = self._augment(self._rng, cat)
            gt = np.stack(np.split(cat[..., :t * 3], t, axis=2))
            lq = np.stack(np.split(cat[..., t * 3:], t, axis=2))
        scale = self.rgb_range / 255.0
        return {"lq": lq.astype(np.float32) * scale,
                "gt": gt.astype(np.float32) * scale,
                "key": [f"video{v}.{idx + j:05d}" for j in range(self.n_seq)]}
