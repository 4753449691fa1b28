"""Multi-device tiled inference: tile batch sharded over a Mesh matches the
single-device engine exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from turtlevsr_tpu.config.options import model_config_from_options
from turtlevsr_tpu.eval.engine import InferenceEngine
from turtlevsr_tpu.models.turtle import init_params
from turtlevsr_tpu.parallel.mesh import make_mesh

from reference_oracle import tiny_opt


def test_sharded_tiled_engine_matches_single_device():
    opt = tiny_opt("Turtle_t1_arch")
    cfg = model_config_from_options(opt)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    rng = np.random.RandomState(5)
    frames = [rng.rand(72, 88, 3).astype(np.float32) for _ in range(2)]

    # 72x88 pad8 -> tile 48 stride 32 -> 2x3 = 6 tiles; mesh of 2 devices
    single = InferenceEngine(cfg, params, mode="tiled", tile=48,
                             tile_overlap=16, dtype=jnp.float32)
    mesh = make_mesh(2)
    sharded = InferenceEngine(cfg, params, mode="tiled", tile=48,
                              tile_overlap=16, dtype=jnp.float32, mesh=mesh)
    for t, fr in enumerate(frames):
        a = single.step(fr)
        b = sharded.step(fr)
        np.testing.assert_allclose(b, a, atol=1e-6, err_msg=f"frame {t}")
