"""Parity tests for the low-level ops against PyTorch semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from turtlevsr_tpu.ops import (
    clipped_softmax,
    l2_normalize,
    layer_norm,
    local_window_mask,
    pixel_shuffle,
    pixel_unshuffle,
    posenc2d,
    resize_bicubic,
    topk_keep,
    upsample_bilinear,
)

from reference_oracle import load_arch_module

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_layer_norm_with_bias_matches_torch():
    ref = load_arch_module("turtle_arch")
    x = RNG.randn(2, 6, 5, 16)
    ln = ref.LayerNorm(16, "WithBias").double()
    with torch.no_grad():
        ln.body.weight.copy_(torch.from_numpy(RNG.randn(16)))
        ln.body.bias.copy_(torch.from_numpy(RNG.randn(16)))
    want = nhwc(ln(nchw(x)))
    got = layer_norm(jnp.asarray(x),
                     jnp.asarray(ln.body.weight.detach().numpy()),
                     jnp.asarray(ln.body.bias.detach().numpy()))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_layer_norm_biasfree_matches_torch():
    ref = load_arch_module("turtle_arch")
    x = RNG.randn(1, 4, 4, 8)
    ln = ref.LayerNorm(8, "BiasFree").double()
    with torch.no_grad():
        ln.body.weight.copy_(torch.from_numpy(RNG.randn(8)))
    want = nhwc(ln(nchw(x)))
    got = layer_norm(jnp.asarray(x),
                     jnp.asarray(ln.body.weight.detach().numpy()), None)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_pixel_unshuffle_matches_torch():
    x = RNG.randn(2, 8, 6, 5)
    want = nhwc(torch.pixel_unshuffle(nchw(x), 2))
    got = pixel_unshuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(got, want, atol=0)


def test_pixel_shuffle_matches_torch():
    x = RNG.randn(2, 4, 3, 20)
    want = nhwc(torch.pixel_shuffle(nchw(x), 2))
    got = pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(got, want, atol=0)


def test_bilinear_x4_matches_torch_upsample():
    x = RNG.randn(1, 7, 9, 3)
    want = nhwc(F.interpolate(nchw(x), scale_factor=4, mode="bilinear",
                              align_corners=False))
    got = upsample_bilinear(jnp.asarray(x), 4)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bicubic_div4_matches_torch_interpolate():
    x = RNG.randn(1, 32, 48, 3)
    want = nhwc(F.interpolate(nchw(x), scale_factor=0.25, mode="bicubic",
                              align_corners=False))
    got = resize_bicubic(jnp.asarray(x), 8, 12)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bicubic_upsample_matches_torch():
    x = RNG.randn(1, 8, 8, 2)
    want = nhwc(F.interpolate(nchw(x), scale_factor=3, mode="bicubic",
                              align_corners=False))
    got = resize_bicubic(jnp.asarray(x), 24, 24)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_l2_normalize_matches_torch():
    x = RNG.randn(3, 4, 17)
    want = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    got = l2_normalize(jnp.asarray(x), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_clipped_softmax_matches_reference():
    ref = load_arch_module("turtle_arch")
    # sparse score tensor like SAB produces: mostly zeros
    x = RNG.randn(2, 3, 6, 10)
    mask = RNG.rand(2, 3, 6, 10) < 0.3
    x = x * mask
    # ensure every row has at least one nonzero (reference NaNs otherwise)
    x[..., 0] = np.where(np.abs(x).sum(-1) == 0, 1.0, x[..., 0])
    want = ref.clipped_softmax(torch.from_numpy(x), dim=-1).numpy()
    got = clipped_softmax(jnp.asarray(x))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_clipped_softmax_empty_row_is_zero_not_nan():
    x = jnp.zeros((2, 5))
    out = clipped_softmax(x)
    assert not np.any(np.isnan(np.asarray(out)))
    np.testing.assert_allclose(out, 0.0)


def test_topk_keep_matches_reference_scatter():
    t1 = load_arch_module("turtle_t1_arch")
    sab = t1.StateAlignBlock(8, 1, False, 2, Scale_patchsize=2).double()
    x = RNG.randn(2, 3, 1, 9, 9)
    want = sab.zero_out_non_top_k(torch.from_numpy(x), 5).numpy()
    got = topk_keep(jnp.asarray(x), 5)
    np.testing.assert_allclose(got, want, atol=0)


def test_local_window_mask_matches_reference():
    t1 = load_arch_module("turtle_t1_arch")
    sab = t1.StateAlignBlock(8, 1, False, 2, Scale_patchsize=2)
    want = sab.create_local_attention_mask(5, 7, 4).numpy()
    got = np.asarray(local_window_mask(5, 7, 4)).astype(bool)
    np.testing.assert_array_equal(got, want)


def test_posenc2d_matches_reference():
    ref = load_arch_module("turtle_arch")
    sab = ref.StateAlignBlock(8, 1, False, 2, Scale_patchsize=2)
    want = sab.positionalencoding2d(16, 6, 9).numpy()  # (C, H, W) float32
    got = np.asarray(posenc2d(16, 6, 9)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv2d_matches_torch_depthwise():
    from turtlevsr_tpu.ops import conv2d

    x = RNG.randn(2, 9, 11, 6)
    w = RNG.randn(6, 1, 3, 3)  # torch OIHW depthwise
    conv = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6, bias=False).double()
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    want = nhwc(conv(nchw(x)))
    got = conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                 padding=1, groups=6)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_conv2d_matches_torch_strided_window():
    """The SAB t1 window conv: kernel=stride=ws, padding=1."""
    from turtlevsr_tpu.ops import conv2d

    ws = 4
    x = RNG.randn(1, 16, 16, 4)
    conv = torch.nn.Conv2d(4, 4, ws, stride=ws, padding=1, groups=4,
                           bias=False).double()
    w = RNG.randn(4, 1, ws, ws)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    want = nhwc(conv(nchw(x)))
    got = conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                 stride=ws, padding=1, groups=4)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-12)
