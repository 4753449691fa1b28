"""Device mesh and sharding helpers.

The reference's distributed layer is one-process-per-GPU DDP over NCCL with
rank bookkeeping (dist_util.py:15-88). On TPU the equivalent is declarative:
a ``jax.sharding.Mesh`` over the slice's chips, batch sharded on the 'data'
axis, params replicated, and XLA inserting the gradient all-reduce over ICI.
Multi-host pods additionally call ``jax.distributed.initialize()``
(see maybe_init_distributed).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialise multi-host JAX when launched on a pod (no-op otherwise).

    Replaces the reference's init_dist pytorch/slurm launchers
    (dist_util.py:15-63); TPU pod runtimes provide coordinator discovery."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
            os.environ.get("TPU_WORKER_COUNT", "1")) > 1:
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(axis_names) == 1:
        arr = np.array(devices[:n])
    else:
        raise NotImplementedError("only 1-D data meshes are needed here")
    return Mesh(arr, tuple(axis_names))


def per_process_batch_size(batch_per_device: int) -> int:
    """Host-side batch each process must load: per-device batch x the
    process's ADDRESSABLE devices (the DDP-equivalent guarantee,
    reference train.py:46-60 one-proc-per-GPU). The global batch is
    batch_per_device * jax.device_count()."""
    return batch_per_device * jax.local_device_count()


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Assemble each process's LOCAL batch into a global array whose leading
    dim is sharded over the mesh.

    Multi-host correct: jax.make_array_from_process_local_data builds the
    global jax.Array from per-process shards (a plain device_put onto a
    global NamedSharding is only valid when every mesh device is
    addressable). Each process passes its own
    per_process_batch_size(batch_per_device) rows."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def process_is_primary() -> bool:
    """rank-0 equivalent (@master_only gating, dist_util.py:78-88)."""
    return jax.process_index() == 0
