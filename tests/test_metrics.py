"""Metric parity vs the reference implementations (executed as oracle)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from turtlevsr_tpu.metrics import (
    bgr2ycbcr,
    calculate_psnr,
    calculate_ssim,
    psnr_255,
    ssim_gaussian,
)

from reference_oracle import REFERENCE_ROOT

RNG = np.random.RandomState(0)


def _load_ref_inference_metrics():
    """Pull ssim_calculate / calc_PSNR / bgr2ycbcr out of inference.py
    without importing the whole module (it has heavy side-effect imports)."""
    import math
    import torch  # noqa: F401
    from scipy.ndimage import gaussian_filter  # noqa: F401

    path = os.path.join(REFERENCE_ROOT, "basicsr", "inference.py")
    src = open(path).read()
    ns = {"np": np, "math": math, "gaussian_filter": gaussian_filter}
    # execute only the metric helpers (defs before the Denoising class)
    cut = src.index("class Denoising")
    header = src[:cut]
    lines = [l for l in header.splitlines()
             if not l.startswith(("import", "from", "sys.path", "placeholder",
                                  "pth_to"))]
    exec("\n".join(lines), ns)
    return ns["ssim_calculate"], ns["calc_PSNR"], ns["bgr2ycbcr"]


def test_psnr_255_matches_reference():
    _, calc_psnr_ref, _ = _load_ref_inference_metrics()
    a = RNG.randint(0, 256, (40, 52, 3)).astype(np.uint8)
    b = np.clip(a.astype(int) + RNG.randint(-20, 20, a.shape), 0, 255).astype(np.uint8)
    np.testing.assert_allclose(psnr_255(a, b), calc_psnr_ref(a, b), rtol=1e-12)


def test_ssim_gaussian_matches_reference():
    ssim_ref, _, _ = _load_ref_inference_metrics()
    a = RNG.randint(0, 256, (40, 52, 3)).astype(np.uint8)
    b = np.clip(a.astype(int) + RNG.randint(-20, 20, a.shape), 0, 255).astype(np.uint8)
    np.testing.assert_allclose(ssim_gaussian(a, b), ssim_ref(a, b), rtol=1e-6)


def test_bgr2ycbcr_matches_reference():
    _, _, ref = _load_ref_inference_metrics()
    a = RNG.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    np.testing.assert_allclose(bgr2ycbcr(a, y_only=True), ref(a, only_y=True),
                               atol=0)


def _load_by_path(name, relpath):
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_metrics_module():
    """Load the reference psnr_ssim.py with its intra-package imports and
    the absent `skimage` stubbed out (this environment lacks skimage)."""
    import types

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.metrics = types.ModuleType("skimage.metrics")
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = sk.metrics
    for name in ("basicsr", "basicsr.utils", "basicsr.metrics"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    _load_by_path("basicsr.utils.matlab_functions",
                  "basicsr/utils/matlab_functions.py")
    _load_by_path("basicsr.metrics.metric_util",
                  "basicsr/metrics/metric_util.py")
    return _load_by_path("basicsr.metrics.psnr_ssim",
                         "basicsr/metrics/psnr_ssim.py")


def test_calculate_psnr_matches_reference():
    m = _ref_metrics_module()
    a = RNG.rand(32, 48, 3)
    b = np.clip(a + RNG.randn(32, 48, 3) * 0.05, 0, 1)
    for crop in (0, 4):
        np.testing.assert_allclose(
            calculate_psnr(a, b, crop_border=crop),
            m.calculate_psnr(a, b, crop_border=crop), rtol=1e-10)
    np.testing.assert_allclose(
        calculate_psnr(a * 255, b * 255, crop_border=0, test_y_channel=True),
        m.calculate_psnr(a * 255, b * 255, crop_border=0,
                         test_y_channel=True), rtol=1e-6)  # fp32 dot order


def test_calculate_ssim_y_channel_matches_reference():
    m = _ref_metrics_module()
    a = (RNG.rand(48, 48, 3) * 255)
    b = np.clip(a + RNG.randn(48, 48, 3) * 10, 0, 255)
    got = calculate_ssim(a, b, crop_border=0, test_y_channel=True)
    want = m.calculate_ssim(a, b, crop_border=0, test_y_channel=True)
    np.testing.assert_allclose(got, want, rtol=1e-6)  # fp32 y-conv + sep conv


def test_calculate_ssim_color_matches_reference_3d():
    """Reference `_ssim_3d` is CUDA-only; reimplement its math on CPU torch
    to validate our separable version."""
    import torch
    import cv2

    a = (RNG.rand(40, 40, 3) * 255)
    b = np.clip(a + RNG.randn(40, 40, 3) * 12, 0, 255)

    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    kernel3 = cv2.getGaussianKernel(11, 1.5)
    k3 = torch.tensor(np.stack([window * k for k in kernel3], axis=0))
    conv3d = torch.nn.Conv3d(1, 1, (11, 11, 11), stride=1, padding=(5, 5, 5),
                             bias=False, padding_mode="replicate").double()
    with torch.no_grad():
        conv3d.weight[0, 0] = k3

    def g3(x):
        t = torch.from_numpy(x).double()[None, None]
        return conv3d(t)[0, 0].detach().numpy()

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = g3(a), g3(b)
    s1 = g3(a * a) - mu1 ** 2
    s2 = g3(b * b) - mu2 ** 2
    s12 = g3(a * b) - mu1 * mu2
    want = float((((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
                  ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean())

    got = calculate_ssim(a, b, crop_border=0, test_y_channel=False)
    np.testing.assert_allclose(got, want, rtol=1e-8)
