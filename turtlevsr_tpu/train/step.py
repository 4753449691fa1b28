"""The sharded training step.

The reference trains with a python loop over the clip's frames, BPTT through
the whole clip under fp16 autocast + GradScaler, and DDP allreduce per
backward (video_restoration_model.py:78-108). TPU-native translation:

  * the frame loop is a ``lax.scan`` with the KV-cache pytree as carry —
    BPTT falls out of ``jax.grad`` through the scan,
  * per-frame compute is ``jax.checkpoint``-rematerialised so 5-frame clips
    at 192² fit HBM without storing every intermediate activation,
  * bf16 mixed precision replaces AMP (no loss scaling needed on TPU),
    master params and the optimizer stay fp32,
  * data parallelism is a ``Mesh('data')`` + NamedSharding on the batch;
    XLA inserts the gradient all-reduce over ICI (no DDP machinery).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from turtlevsr_tpu.config.options import ModelConfig
from turtlevsr_tpu.models.turtle import forward, init_cache
from turtlevsr_tpu.train.losses import l1_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_optimizer(train_opt: dict, schedule: Callable) -> optax.GradientTransformation:
    """AdamW regardless of the YAML's ``optim_g.type`` — reproducing the
    reference which pops ``type`` and always builds AdamW
    (video_restoration_model.py:67-69, SURVEY.md Q5)."""
    og = dict(train_opt["optim_g"])
    betas = og.get("betas", [0.9, 0.999])
    return optax.adamw(
        learning_rate=schedule,
        b1=float(betas[0]),
        b2=float(betas[1]),
        eps=1e-8,
        weight_decay=float(og.get("weight_decay", 0.0)),
    )


def _cast_tree(tree, dtype):
    def cast(x):
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, tree)


REMAT_POLICIES = {
    # everything recomputed in the backward pass: minimum HBM, max FLOPs
    "nothing": jax.checkpoint_policies.nothing_saveable,
    # keep matmul/conv outputs without batch dims (weights-side dots)
    "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    # keep every dot output: max HBM, min recompute
    "dots": jax.checkpoint_policies.dots_saveable,
}


def clip_loss_fn(params, cfg: ModelConfig, lq, gt, *,
                 compute_dtype=jnp.bfloat16, remat: bool = True,
                 remat_policy: str = "nothing", loss_fn=l1_loss):
    """Mean per-frame L1 over one clip, cache threaded through a scan.

    lq, gt: (B, T, H, W, C) in [0, 1]. The frame pairing matches the
    reference: previous = frame j-1 (j itself for j == 0)
    (video_restoration_model.py:86-91).
    """
    b, t, h, w, c = lq.shape
    params_c = _cast_tree(params, compute_dtype)
    lq_c = lq.astype(compute_dtype)
    cache0 = init_cache(cfg, b, h, w, dtype=compute_dtype)

    prev = jnp.concatenate([lq_c[:, :1], lq_c[:, :-1]], axis=1)
    xs = (jnp.moveaxis(prev, 1, 0), jnp.moveaxis(lq_c, 1, 0),
          jnp.moveaxis(gt, 1, 0))

    def frame_step(params_c, cache, p, cur, g):
        x_pair = jnp.stack([p, cur], axis=1)
        out, cache = forward(params_c, cfg, x_pair, cache)
        return cache, loss_fn(out, g)

    if remat:
        frame_step = jax.checkpoint(
            frame_step, policy=REMAT_POLICIES[remat_policy])

    def body(cache, xs_t):
        p, cur, g = xs_t
        cache, loss = frame_step(params_c, cache, p, cur, g)
        return cache, loss

    _, losses = jax.lax.scan(body, cache0, xs)
    return jnp.mean(losses)


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation, *,
                    compute_dtype=jnp.bfloat16, remat: bool = True,
                    remat_policy: str = "nothing", mesh=None,
                    donate: bool = True):
    """Build the jitted train step.

    With ``mesh`` (a jax.sharding.Mesh with a 'data' axis), the batch is
    sharded over 'data' and the state replicated; XLA's SPMD partitioner
    emits the psum for gradients over ICI.
    """
    # kernels='pallas' is differentiable via kernels/vjp.py (fused forward,
    # XLA-chain backward) and safe to train with

    def step_fn(state: TrainState, lq, gt):
        loss, grads = jax.value_and_grad(clip_loss_fn)(
            state.params, cfg, lq, gt, compute_dtype=compute_dtype,
            remat=remat, remat_policy=remat_policy)
        grads = _cast_tree(grads, jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"l_pix": loss}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
