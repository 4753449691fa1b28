"""Checkpoint / auto-resume on Orbax.

The reference saves two artifacts per checkpoint: ``net_g_{iter}.pth``
(params only, base_model.py:193-224) and ``{iter}.state`` (epoch/iter/
optimizers/schedulers, :288-311), and auto-resumes from the newest state
file at startup (train.py:147-167). Equivalent here:

  experiments/{name}/training_states/{iter}/   — full TrainState (orbax)
  experiments/{name}/models/net_g_{iter}/      — params only (orbax)

Schedules are pure functions of the step, so no scheduler state is saved.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(exp_root: str, step: int, state, params_only=None) -> None:
    """Save the TrainState and a params-only snapshot."""
    cp = _checkpointer()
    state_dir = os.path.join(exp_root, "training_states", str(step))
    cp.save(os.path.abspath(state_dir), jax.device_get(state), force=True)
    net = params_only if params_only is not None else state.params
    net_dir = os.path.join(exp_root, "models", f"net_g_{step}")
    cp.save(os.path.abspath(net_dir), jax.device_get(net), force=True)


def latest_checkpoint_step(exp_root: str) -> Optional[int]:
    """Newest saved step (train.py:147-158 auto-resume scan)."""
    d = os.path.join(exp_root, "training_states")
    if not os.path.isdir(d):
        return None
    steps = [int(m.group(1)) for f in os.listdir(d)
             if (m := re.fullmatch(r"(\d+)", f))]
    return max(steps) if steps else None


def restore_checkpoint(exp_root: str, step: int, target):
    """Restore a TrainState saved by save_checkpoint (shapes/dtypes taken
    from ``target``)."""
    import orbax.checkpoint as ocp

    cp = _checkpointer()
    path = os.path.abspath(os.path.join(exp_root, "training_states",
                                        str(step)))
    restored = cp.restore(path, item=jax.device_get(target))
    return restored


def restore_params(path: str, target=None):
    """Restore a params-only snapshot (models/net_g_{iter} dir), or convert
    a reference .pth checkpoint transparently."""
    if path.endswith(".pth"):
        from turtlevsr_tpu.io.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    cp = _checkpointer()
    return cp.restore(os.path.abspath(path),
                      item=jax.device_get(target) if target is not None
                      else None)
