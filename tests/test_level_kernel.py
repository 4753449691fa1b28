"""Level megakernel (kernels/level.py) vs the sequential block chain.

The megakernel is a measured on-chip NEGATIVE (r4: slower than the split
stats+FFN kernels — see channel_run_ok) and ships opt-in; these tests pin
its correctness so the knob stays usable."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turtlevsr_tpu.models import blocks as B

RNG = np.random.RandomState(7)


@pytest.fixture(autouse=True)
def _enable_megakernel():
    os.environ["TURTLE_MEGAKERNEL"] = "1"
    yield
    del os.environ["TURTLE_MEGAKERNEL"]


def _spec(c, heads, kernels):
    return B.BlockSpec(attn_type="Channel", ffw_type="GFFW", dim=c,
                       num_heads=heads, ffn_expansion_factor=2.5,
                       bias=False, layernorm_bias=False,
                       num_frames_tocache=0, kernels=kernels)


def _mk_blocks(n, c, heads, dtype=jnp.float32):
    spec = _spec(c, heads, "pallas")
    ps = []
    for i in range(n):
        p = B.attn_block_init(jax.random.PRNGKey(100 + i), spec, dtype)
        # randomise the temperature so the softmax isn't trivial
        p["attn"]["temperature"] = jnp.asarray(
            1.0 + 0.5 * RNG.rand(heads, 1, 1), dtype)
        ps.append(p)
    return ps


@pytest.mark.parametrize("heads", [1, 2])
def test_channel_run_matches_chain(heads):
    c = 128
    x = jnp.asarray(RNG.randn(1, 16, 32, c) * 0.5, jnp.float32)
    ps = _mk_blocks(3, c, heads)
    spec = _spec(c, heads, "pallas")
    assert B.channel_run_ok(ps, x, spec)
    got = B.channel_run_apply(ps, x, spec)

    import dataclasses
    spec_x = dataclasses.replace(spec, kernels="xla")
    want = x
    for p in ps:
        want, _ = B.attn_block_apply(p, want, spec_x, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_channel_run_matches_split_kernels():
    """Megakernel == the split stats+FFN pallas path (both interpret)."""
    c = 128
    heads = 2
    x = jnp.asarray(RNG.randn(1, 16, 32, c) * 0.5, jnp.float32)
    ps = _mk_blocks(2, c, heads)
    spec = _spec(c, heads, "pallas")
    got = B.channel_run_apply(ps, x, spec)
    want = x
    os.environ["TURTLE_MEGAKERNEL"] = "0"
    try:
        for p in ps:
            want, _ = B.attn_block_apply(p, want, spec, None)
    finally:
        os.environ["TURTLE_MEGAKERNEL"] = "1"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_channel_run_grads_match():
    c = 128
    heads = 2
    x = jnp.asarray(RNG.randn(1, 8, 16, c) * 0.5, jnp.float32)
    ps = _mk_blocks(2, c, heads)
    spec = _spec(c, heads, "pallas")

    import dataclasses
    spec_x = dataclasses.replace(spec, kernels="xla")

    def loss_mk(ps_, x_):
        return jnp.sum(B.channel_run_apply(ps_, x_, spec) ** 2)

    def loss_xla(ps_, x_):
        y = x_
        for p in ps_:
            y, _ = B.attn_block_apply(p, y, spec_x, None)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_mk, argnums=(0, 1))(ps, x)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(ps, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4), g1, g2)


def test_channel_run_bf16():
    """bf16 megakernel vs the split stats+FFN pallas path (both compute
    LN/chains/softmax in fp32 internally; same tolerance as the other
    bf16 kernel twins)."""
    c = 128
    heads = 2
    x = jnp.asarray(RNG.randn(1, 16, 32, c) * 0.5, jnp.bfloat16)
    ps = _mk_blocks(2, c, heads, jnp.bfloat16)
    spec = _spec(c, heads, "pallas")
    got = np.asarray(B.channel_run_apply(ps, x, spec), np.float32)
    want = x
    os.environ["TURTLE_MEGAKERNEL"] = "0"
    try:
        for p in ps:
            want, _ = B.attn_block_apply(p, want, spec, None)
    finally:
        os.environ["TURTLE_MEGAKERNEL"] = "1"
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=0, atol=2e-2)


def test_negative_kernels_default_off():
    """The megakernel is a measured on-chip negative: it must stay OFF
    unless TURTLE_MEGAKERNEL=1 explicitly opts in."""
    c = 128
    x = jnp.zeros((1, 16, 32, c), jnp.float32)
    ps = _mk_blocks(2, c, 2)
    spec = _spec(c, 2, "pallas")
    del os.environ["TURTLE_MEGAKERNEL"]  # fixture set it; test the default
    try:
        assert not B.channel_run_ok(ps, x, spec)
    finally:
        os.environ["TURTLE_MEGAKERNEL"] = "1"
    assert B.channel_run_ok(ps, x, spec)
