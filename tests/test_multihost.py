"""Multi-host-correct batch placement (verdict r1 item 3).

On a real pod each process only addresses its local chips, so the host
batch must be sized by local_device_count and assembled into a global
array via make_array_from_process_local_data — a plain device_put onto a
global sharding is single-host-only. These run on the 8-virtual-device CPU
mesh (1 process), where the same code path must behave identically."""

import numpy as np
import jax

from turtlevsr_tpu.parallel.mesh import (make_mesh, per_process_batch_size,
                                         shard_batch)


def test_per_process_batch_math():
    # single process: local == global device count
    assert jax.local_device_count() == 8
    assert per_process_batch_size(2) == 16
    assert per_process_batch_size(1) == 8


def test_shard_batch_global_array():
    mesh = make_mesh(8)
    batch_per_dev = 2
    local = np.arange(per_process_batch_size(batch_per_dev) * 3,
                      dtype=np.float32).reshape(-1, 3)
    g = shard_batch(mesh, local)
    assert g.shape == (16, 3)
    # leading dim sharded over 'data': each device holds 2 rows
    shard_shapes = {s.data.shape for s in g.addressable_shards}
    assert shard_shapes == {(2, 3)}
    np.testing.assert_array_equal(np.asarray(g), local)


def test_shard_batch_pytree():
    mesh = make_mesh(8)
    lq = np.zeros((8, 2, 4, 4, 3), np.float32)
    gt = np.ones((8, 2, 4, 4, 3), np.float32)
    glq, ggt = shard_batch(mesh, (lq, gt))
    assert glq.shape == lq.shape and ggt.shape == gt.shape
    assert float(np.asarray(ggt).mean()) == 1.0
