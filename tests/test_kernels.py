"""Pallas kernels vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turtlevsr_tpu.kernels.ffn import fused_block_ffn
from turtlevsr_tpu.models import blocks as B
from turtlevsr_tpu.ops.norm import layer_norm

RNG = np.random.RandomState(0)


def _x(b=2, h=16, w=32, c=8):
    return jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)


def _ln(c):
    return (jnp.asarray(RNG.randn(c), jnp.float32),
            jnp.asarray(RNG.randn(c), jnp.float32))


def _randomize(params):
    """Replace zero-init scales so the test isn't vacuous."""
    return jax.tree.map(
        lambda a: jnp.asarray(RNG.randn(*a.shape), a.dtype)
        if np.all(np.asarray(a) == 0) else a, params)


def test_fused_gffw_matches_jnp():
    x = _x()
    c = x.shape[-1]
    lw, lb = _ln(c)
    p = B.gffw_init(jax.random.PRNGKey(0), c, 2.5, True)
    want = x + B.gffw_apply(p, layer_norm(x, lw, lb))
    hid = p["project_in"]["weight"].shape[-1]
    got = fused_block_ffn(
        x, ln_w=lw, ln_b=lb,
        w1=p["project_in"]["weight"].reshape(c, hid),
        b1=p["project_in"].get("bias"),
        wd=p["dwconv"]["weight"].reshape(3, 3, hid),
        bd=p["dwconv"].get("bias"),
        w2=p["project_out"]["weight"].reshape(hid // 2, c),
        b2=p["project_out"].get("bias"),
        mode="gate", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_ffw_matches_jnp():
    x = _x(1, 8, 16, 8)
    c = x.shape[-1]
    lw, lb = _ln(c)
    p = _randomize(B.ffw_init(jax.random.PRNGKey(1), c))
    want = x + B.ffw_apply(p, layer_norm(x, lw, lb))
    got = fused_block_ffn(
        x, ln_w=lw, ln_b=lb,
        w1=p["conv4"]["weight"].reshape(c, 2 * c), b1=p["conv4"]["bias"],
        w2=p["conv5"]["weight"].reshape(2 * c, c), b2=p["conv5"]["bias"],
        scale=p["gamma"], mode="gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_reduced_attn_matches_jnp():
    x = _x(1, 8, 16, 8)
    c = x.shape[-1]
    lw, lb = _ln(c)
    p = _randomize(B.reduced_attn_init(jax.random.PRNGKey(2), c))
    ra, _ = B.reduced_attn_apply(p, layer_norm(x, lw, lb))
    want = x + ra
    dw = 2 * c
    got = fused_block_ffn(
        x, ln_w=lw, ln_b=lb,
        w1=p["conv1"]["weight"].reshape(c, dw), b1=p["conv1"]["bias"],
        wd=p["conv2"]["weight"].reshape(3, 3, dw), bd=p["conv2"]["bias"],
        w2=p["conv3"]["weight"].reshape(dw, c), b2=p["conv3"]["bias"],
        scale=p["beta"], mode="gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_chained_reduced_attn_ffw_block():
    """The one-traversal ReducedAttn+FFW block kernel == the two-step
    chain (ReducedAttn half then FFW half), which itself is pinned to the
    torch reference by the parity tests."""
    x = _x(1, 8, 16, 8)
    c = x.shape[-1]
    spec = B.BlockSpec(attn_type="ReducedAttn", ffw_type="FFW", dim=c,
                       num_heads=1, ffn_expansion_factor=2.5, bias=False,
                       layernorm_bias=True, num_frames_tocache=0,
                       kernels="pallas")
    p = _randomize(B.attn_block_init(jax.random.PRNGKey(4), spec))
    y = B._fused_reduced_attn_half(p, x, spec)
    want = B._fused_ffn_half(p, y, spec)
    got = B._fused_reduced_attn_half(p, x, spec, chain_ffw=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
    # the block dispatcher takes the chained path at this shape
    out, slot = B.attn_block_apply(p, x, spec, None)
    assert slot is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(got), atol=0)


def test_chained_block_grads_match():
    x = _x(1, 8, 16, 8)
    c = x.shape[-1]
    spec = B.BlockSpec(attn_type="ReducedAttn", ffw_type="FFW", dim=c,
                       num_heads=1, ffn_expansion_factor=2.5, bias=False,
                       layernorm_bias=True, num_frames_tocache=0,
                       kernels="pallas")
    p = _randomize(B.attn_block_init(jax.random.PRNGKey(5), spec))

    def loss_chained(p_, x_):
        return jnp.sum(B._fused_reduced_attn_half(p_, x_, spec,
                                                  chain_ffw=True) ** 2)

    def loss_twostep(p_, x_):
        y = B._fused_reduced_attn_half(p_, x_, spec)
        return jnp.sum(B._fused_ffn_half(p_, y, spec) ** 2)

    g1 = jax.grad(loss_chained, argnums=(0, 1))(p, x)
    g2 = jax.grad(loss_twostep, argnums=(0, 1))(p, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4), g1, g2)


def test_fused_gffw_biasfree_ln():
    x = _x(1, 8, 16, 8)
    c = x.shape[-1]
    lw, _ = _ln(c)
    p = B.gffw_init(jax.random.PRNGKey(3), c, 2.5, False)
    want = x + B.gffw_apply(p, layer_norm(x, lw, None))
    hid = p["project_in"]["weight"].shape[-1]
    got = fused_block_ffn(
        x, ln_w=lw, ln_b=None,
        w1=p["project_in"]["weight"].reshape(c, hid),
        wd=p["dwconv"]["weight"].reshape(3, 3, hid),
        w2=p["project_out"]["weight"].reshape(hid // 2, c),
        mode="gate", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
