"""The lattice split/merge Pallas copy kernels vs the XLA reshape/transpose
reference (interpret mode on CPU), forward and VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turtlevsr_tpu.kernels.lattice import (
    lattice_merge_op,
    lattice_split_op,
    lattice_supported,
)
from turtlevsr_tpu.models.blocks import _lattice_merge, _lattice_split

SHAPES = [  # (bn, h, w, c, ws) — dec2/dec3-like widths, tiny spatial dims
    (2, 16, 32, 128, 8),
    (1, 8, 16, 256, 4),
    (3, 16, 16, 128, 8),
]


@pytest.mark.parametrize("bn,h,w,c,ws", SHAPES)
def test_split_matches_xla(bn, h, w, c, ws):
    assert lattice_supported(h, w, c, ws)
    x = jax.random.normal(jax.random.PRNGKey(0), (bn, h, w, c), jnp.float32)
    ref = _lattice_split(x, ws)
    got = lattice_split_op(x, ws, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("bn,h,w,c,ws", SHAPES)
def test_merge_matches_xla(bn, h, w, c, ws):
    hh, ww = h // ws, w // ws
    t = jax.random.normal(jax.random.PRNGKey(1),
                          (bn, hh * ww, ws * ws * c), jnp.float32)
    ref = _lattice_merge(t, ws, h, w)
    got = lattice_merge_op(t, ws, h, w, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_roundtrip_and_grads():
    bn, h, w, c, ws = 1, 16, 16, 128, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (bn, h, w, c), jnp.float32)
    t = lattice_split_op(x, ws, True)
    np.testing.assert_array_equal(
        np.asarray(lattice_merge_op(t, ws, h, w, True)), np.asarray(x))

    # VJPs are the inverse permutations — check against the XLA path's
    ct = jax.random.normal(jax.random.PRNGKey(3), t.shape, jnp.float32)
    g = jax.vjp(lambda v: lattice_split_op(v, ws, True), x)[1](ct)[0]
    g_ref = jax.vjp(lambda v: _lattice_split(v, ws), x)[1](ct)[0]
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))

    cm = jax.random.normal(jax.random.PRNGKey(4), x.shape, jnp.float32)
    g2 = jax.vjp(lambda v: lattice_merge_op(v, ws, h, w, True), t)[1](cm)[0]
    g2_ref = jax.vjp(lambda v: _lattice_merge(v, ws, h, w), t)[1](cm)[0]
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g2_ref))


def test_bf16_bench_shapes():
    # the real dec2/dec3 720p shapes, bf16 (ww=80 / 40 sublane-full blocks)
    for (h, w, c, ws) in [(368, 640, 128, 8), (184, 320, 256, 8)]:
        x = jax.random.normal(jax.random.PRNGKey(5), (1, h, w, c),
                              jnp.float32).astype(jnp.bfloat16)
        ref = _lattice_split(x, ws)
        got = lattice_split_op(x, ws, True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        back = lattice_merge_op(got, ws, h, w, True)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
