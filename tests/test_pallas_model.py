"""Full-model equivalence: kernels='pallas' (interpret mode on CPU) vs the
XLA path, in float32."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turtlevsr_tpu.config.options import model_config_from_options
from turtlevsr_tpu.models.turtle import forward, init_cache, init_params

from reference_oracle import tiny_opt


@pytest.mark.parametrize("arch", ["Turtle_t1_arch", "Turtle_arch"])
def test_pallas_model_matches_xla(arch):
    opt = tiny_opt(arch)
    cfg_x = model_config_from_options(opt)
    cfg_p = dataclasses.replace(cfg_x, kernels="pallas")
    params = init_params(jax.random.PRNGKey(0), cfg_x, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    frames = rng.rand(3, 1, 64, 64, 3).astype(np.float32)
    cache_x = init_cache(cfg_x, 1, 64, 64, dtype=jnp.float32)
    cache_p = init_cache(cfg_p, 1, 64, 64, dtype=jnp.float32)
    prev = frames[0]
    for t in range(3):
        x = jnp.asarray(np.stack([prev, frames[t]], axis=1))
        out_x, cache_x = forward(params, cfg_x, x, cache_x)
        out_p, cache_p = forward(params, cfg_p, x, cache_p)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=3e-6, err_msg=f"frame {t}")
        prev = frames[t]


def test_pallas_gradients_match_xla():
    """The custom-VJP pallas path must produce the same gradients as the
    differentiable XLA path."""
    from turtlevsr_tpu.train.step import clip_loss_fn

    opt = tiny_opt("Turtle_t1_arch")
    cfg_x = model_config_from_options(opt)
    cfg_p = dataclasses.replace(cfg_x, kernels="pallas")
    params = init_params(jax.random.PRNGKey(1), cfg_x, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    lq = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)

    def loss(cfg):
        return jax.grad(clip_loss_fn)(params, cfg, lq, gt,
                                      compute_dtype=jnp.float32, remat=True)

    gx = loss(cfg_x)
    gp = loss(cfg_p)
    for (kx, vx), (kp, vp) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gx)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(gp)[0],
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), atol=1e-5,
                                   err_msg=str(kx))
