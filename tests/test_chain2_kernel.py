"""Two-stage chained kernel (kernels/chain2.py) vs the split chains.

The dw->dw chain is a measured on-chip NEGATIVE (r4, see ra_pair_ok) and
ships opt-in; these tests pin its correctness so the knob stays usable."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turtlevsr_tpu.models import blocks as B

RNG = np.random.RandomState(11)


@pytest.fixture(autouse=True)
def _enable_chain2():
    os.environ["TURTLE_CHAIN2"] = "1"
    yield
    del os.environ["TURTLE_CHAIN2"]


def _spec(c, ffw):
    return B.BlockSpec(attn_type="ReducedAttn", ffw_type=ffw, dim=c,
                       num_heads=1, ffn_expansion_factor=2.5, bias=False,
                       layernorm_bias=True, num_frames_tocache=0,
                       kernels="pallas")


def _randomize(params):
    return jax.tree.map(
        lambda a: jnp.asarray(RNG.randn(*a.shape), a.dtype)
        if np.all(np.asarray(a) == 0) else a, params)


def test_ra_ffw_pair_matches_two_singles():
    """Pair kernel == two sequential (already-chained) RA+FFW blocks."""
    c = 8
    x = jnp.asarray(RNG.randn(1, 12, 16, c) * 0.5, jnp.float32)
    spec = _spec(c, "FFW")
    p1 = _randomize(B.attn_block_init(jax.random.PRNGKey(0), spec))
    p2 = _randomize(B.attn_block_init(jax.random.PRNGKey(1), spec))
    assert B.ra_pair_ok(p1, p2, x, spec)
    got = B.ra_pair_apply(p1, p2, x, spec)
    want = B._fused_reduced_attn_half(p1, x, spec, chain_ffw=True)
    want = B._fused_reduced_attn_half(p2, want, spec, chain_ffw=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_ra_gffw_block_matches_two_halves():
    """RA+GFFW chain == RA half then GFFW half (split kernels)."""
    c = 8
    x = jnp.asarray(RNG.randn(1, 12, 16, c) * 0.5, jnp.float32)
    spec = _spec(c, "GFFW")
    p = _randomize(B.attn_block_init(jax.random.PRNGKey(2), spec))
    assert B.ra_gffw_ok(p, x, spec)
    got = B.ra_gffw_apply(p, x, spec)
    y = B._fused_reduced_attn_half(p, x, spec)
    want = B._fused_ffn_half(p, y, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_pair_dispatch_in_level():
    """level_block_apply takes the pair path and matches block-by-block."""
    import dataclasses

    from turtlevsr_tpu.config.options import LevelSpec
    from turtlevsr_tpu.models import turtle as T

    c = 8
    x = jnp.asarray(RNG.randn(1, 12, 16, c) * 0.5, jnp.float32)
    spec = _spec(c, "FFW")
    ps = [_randomize(B.attn_block_init(jax.random.PRNGKey(10 + i), spec))
          for i in range(3)]  # odd count: one pair + one single
    params = {"transformer_blocks": ps}
    lvl = LevelSpec(dim=c, num_blocks=3, num_heads=1,
                    attn_type1="ReducedAttn", attn_type2="ReducedAttn",
                    ffw_type="FFW", num_frames_tocache=0)
    from turtlevsr_tpu.config.options import ModelConfig

    # minimal cfg carrying the fields _block_spec consults
    cfg = ModelConfig(
        variant="t1", inp_channels=3, out_channels=3, dim=c,
        enc_blocks=(3, 3, 3), middle_blocks=3, dec_blocks=(3, 3, 3),
        num_refinement_blocks=3, num_heads=(1, 1, 1, 1),
        ffn_expansion_factor=2.5, bias=False, layernorm_bias=True,
        use_both_input=False, num_frames_tocache=0, kernels="pallas",
        enc1=lvl, enc2=lvl, enc3=lvl, latent=lvl, dec3=lvl, dec2=lvl,
        dec1=lvl, refinement=lvl)
    got, slot = T.level_block_apply(params, x, cfg, lvl, None)
    assert slot is None
    want = x
    for p in ps:
        want, _ = B.attn_block_apply(p, want, spec, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_pair_grads_match():
    c = 8
    x = jnp.asarray(RNG.randn(1, 8, 16, c) * 0.5, jnp.float32)
    spec = _spec(c, "FFW")
    p1 = _randomize(B.attn_block_init(jax.random.PRNGKey(3), spec))
    p2 = _randomize(B.attn_block_init(jax.random.PRNGKey(4), spec))

    def loss_pair(ps, x_):
        return jnp.sum(B.ra_pair_apply(ps[0], ps[1], x_, spec) ** 2)

    def loss_seq(ps, x_):
        y = B._fused_reduced_attn_half(ps[0], x_, spec, chain_ffw=True)
        y = B._fused_reduced_attn_half(ps[1], y, spec, chain_ffw=True)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_pair, argnums=(0, 1))((p1, p2), x)
    g2 = jax.grad(loss_seq, argnums=(0, 1))((p1, p2), x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4), g1, g2)


def test_ra_gffw_bf16():
    c = 8
    x = jnp.asarray(RNG.randn(1, 12, 16, c) * 0.5, jnp.bfloat16)
    spec = _spec(c, "GFFW")
    p = _randomize(B.attn_block_init(jax.random.PRNGKey(5), spec, jnp.bfloat16))
    got = np.asarray(B.ra_gffw_apply(p, x, spec), np.float32)
    y = B._fused_reduced_attn_half(p, x, spec)
    want = np.asarray(B._fused_ffn_half(p, y, spec), np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-2)


def test_chain2_default_off():
    """The dw->dw chain is a measured on-chip negative: OFF unless
    TURTLE_CHAIN2=1 opts in."""
    c = 8
    x = jnp.zeros((1, 12, 16, c), jnp.float32)
    spec = _spec(c, "FFW")
    p1 = B.attn_block_init(jax.random.PRNGKey(0), spec)
    p2 = B.attn_block_init(jax.random.PRNGKey(1), spec)
    del os.environ["TURTLE_CHAIN2"]  # fixture set it; test the default
    try:
        assert not B.ra_pair_ok(p1, p2, x, spec)
    finally:
        os.environ["TURTLE_CHAIN2"] = "1"
    assert B.ra_pair_ok(p1, p2, x, spec)


def test_t0_dead_k_cache_is_vestigial():
    """Quirk Q1: the t0 SAB K cache is never read — init_cache must keep
    it tiny (a re-materialised (NF, HW, ws^2*c) buffer would silently
    cost ~120 MB/frame of ring writes per CHM level)."""
    import dataclasses

    import turtlevsr_tpu as tv
    from turtlevsr_tpu.models import build_model

    opt = tv.load_options("options/Turtle_Desnow.yml", is_train=False)
    cfg, _, init_cache, _ = build_model(opt)
    cache = init_cache(cfg, 1, 96, 160, dtype=jnp.float32)
    # slots 5/6/7 are the dec3/dec2/dec1 CHM (SAB) slots in the desnow
    # config; the latent FHR slots (3/4) keep their real K caches
    for i in (5, 6, 7):
        slot = cache[i]
        assert slot is not None
        assert slot["k"].size <= 8 * slot["k"].shape[1] * 8,             (i, slot["k"].shape)
        assert slot["v"].shape[2] > 8  # the V cache stays real
