"""Training-step tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from turtlevsr_tpu.config.options import model_config_from_options
from turtlevsr_tpu.models.turtle import init_params
from turtlevsr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from turtlevsr_tpu.train.lr_schedule import build_schedule
from turtlevsr_tpu.train.step import TrainState, clip_loss_fn, make_optimizer, make_train_step

from reference_oracle import tiny_opt

TRAIN_OPT = {
    "optim_g": {"lr": 4e-4, "weight_decay": 0, "betas": [0.9, 0.99]},
    "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 1000,
                  "eta_min": 1e-7},
    "total_iter": 1000,
    "warmup_iter": -1,
}


def _setup():
    cfg = model_config_from_options(tiny_opt())
    tx = make_optimizer(TRAIN_OPT, build_schedule(TRAIN_OPT))
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, tx, params


def test_remat_policies_same_gradients():
    """All jax.checkpoint policies must give identical grads (they only
    trade memory for recompute)."""
    cfg, _, params = _setup()
    rng = np.random.RandomState(2)
    lq = jnp.asarray(rng.rand(1, 2, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 2, 32, 32, 3), jnp.float32)

    def grads_for(policy):
        return jax.grad(clip_loss_fn)(params, cfg, lq, gt,
                                      compute_dtype=jnp.float32,
                                      remat=True, remat_policy=policy)

    g0 = jax.tree.leaves(grads_for("nothing"))
    for policy in ("dots_no_batch", "dots"):
        gp = jax.tree.leaves(grads_for(policy))
        for a, b in zip(g0, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=policy)


def test_clip_loss_finite_grads():
    cfg, _, params = _setup()
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(1, 3, 64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 3, 64, 64, 3), jnp.float32)
    loss, grads = jax.value_and_grad(clip_loss_fn)(
        params, cfg, lq, gt, compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the cache masking must not freeze gradients: most leaves nonzero
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > 0.8 * len(leaves), f"{nonzero}/{len(leaves)} grads nonzero"


def test_sharded_train_step_runs_and_updates():
    cfg, tx, params = _setup()
    mesh = make_mesh(8)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32, remat=True,
                           mesh=mesh, donate=False)
    state = replicate(mesh, TrainState.create(params, tx))
    rng = np.random.RandomState(1)
    lq, gt = shard_batch(mesh, (
        rng.rand(8, 2, 64, 64, 3).astype(np.float32),
        rng.rand(8, 2, 64, 64, 3).astype(np.float32)))
    new_state, logs = step(state, lq, gt)
    assert np.isfinite(float(logs["l_pix"]))
    assert int(new_state.step) == 1
    # parameters changed
    before = jax.tree.leaves(params)[0]
    after = jax.tree.leaves(new_state.params)[0]
    assert np.any(np.asarray(before) != np.asarray(after))


def test_schedules_match_torch():
    import torch

    base_lr = 4e-4
    net = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(net.parameters(), lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=1000,
                                                        eta_min=1e-7)
    sched = build_schedule(TRAIN_OPT)
    # reference loop: scheduler.step() before iters > 1
    # (train.py:233 / base_model.py:163-170)
    for it in range(1, 50):
        if it > 1:
            tsched.step()
        want = opt.param_groups[0]["lr"]
        got = float(sched(it - 1))
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"iter {it}")


def test_training_reduces_loss():
    """End-to-end learning sanity: repeated steps on one batch must drive
    the L1 loss down (catches optimizer/schedule/gradient wiring breaks)."""
    cfg, tx, params = _setup()
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32, remat=True,
                           donate=False)
    state = TrainState.create(params, tx)
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)
    losses = []
    for _ in range(10):
        state, logs = step(state, lq, gt)
        losses.append(float(logs["l_pix"]))
    # random targets aren't learnable to zero, but the loss must fall
    # steadily under repeated steps on the same batch
    assert losses[-1] < losses[0] - 5e-3, losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def _bptt_grad_parity(model_name, scale=1, t_frames=3):
    """jax.grad through the cache-carrying scan == torch autograd through
    the executed reference's python frame loop, in float64.

    The reference does NOT detach the KV caches between frames
    (video_restoration_model.py:84-96), so its training is full BPTT
    through the causal history — exactly what grad-of-scan gives us. Its
    loss is sum of per-frame L1 / frame_num (:94-98), i.e. the mean our
    clip_loss_fn takes; the `0 * sum(p.sum())` DDP term (:99) adds exactly
    zero to every gradient. For Turtle_arch (t0), quirk Q1 makes the SAB
    q chain dead: both sides must agree on exactly-zero grads there.
    """
    import torch

    from reference_oracle import build_reference_model
    from turtlevsr_tpu.io.torch_convert import (
        params_from_torch_state_dict, torch_state_dict_from_params)
    from test_model_parity import _KeepF64

    opt = tiny_opt(model_name)
    ref = build_reference_model(opt)  # float64
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(),
                                          dtype=jnp.float64)

    b, h, w = 1, 64, 64
    rng = np.random.RandomState(11)
    lq = rng.rand(b, t_frames, 3, h, w)
    gt = rng.rand(b, t_frames, 3, h * scale, w * scale)

    # --- torch: the reference's optimize_parameters loop, fp64 ---
    lq_t, gt_t = torch.from_numpy(lq), torch.from_numpy(gt)
    k_cache = v_cache = None
    total = 0.0
    with _KeepF64():
        for j in range(t_frames):
            cur = lq_t[:, j].unsqueeze(1)
            prev = lq_t[:, j if j == 0 else j - 1].unsqueeze(1)
            x = torch.concat([prev, cur], dim=1)
            out, k_cache, v_cache = ref(x, k_cache, v_cache)
            total = total + (out - gt_t[:, j]).abs().mean()
    (total / t_frames).backward()
    # params the loss never touches (t0's dead q chain) keep grad=None in
    # torch; the reference's 0*sum(p.sum()) term makes them exactly zero
    want = {n: (p.grad.numpy() if p.grad is not None
                else np.zeros(p.shape, np.float64))
            for n, p in ref.named_parameters()}

    # --- ours: grad through the scan-BPTT clip loss at fp64 ---
    def loss64(p, t):  # l1_loss casts to fp32; keep the oracle run fp64
        return jnp.mean(jnp.abs(p - t))

    lq_j = jnp.asarray(lq.transpose(0, 1, 3, 4, 2))
    gt_j = jnp.asarray(gt.transpose(0, 1, 3, 4, 2))
    grads = jax.grad(clip_loss_fn)(params, cfg, lq_j, gt_j,
                                   compute_dtype=jnp.float64, remat=False,
                                   loss_fn=loss64)
    got = torch_state_dict_from_params(jax.device_get(grads))

    missing = set(want) - set(got)
    assert not missing, f"grads missing for {sorted(missing)[:5]}"
    for name, g_ref in want.items():
        np.testing.assert_allclose(got[name], g_ref, atol=5e-9, rtol=1e-6,
                                   err_msg=f"grad mismatch: {name}")


def test_bptt_grad_parity_t1():
    _bptt_grad_parity("Turtle_t1_arch")


def test_bptt_grad_parity_t0():
    _bptt_grad_parity("Turtle_arch")


def test_adamw_update_parity_vs_torch():
    """optax.adamw (as built by make_optimizer) must produce the same
    parameter trajectory as torch.optim.AdamW — the reference's hardwired
    optimizer (video_restoration_model.py:67-69) — including nonzero
    weight decay and bias correction, over several steps at fp64."""
    import torch

    topt = {"optim_g": {"lr": 3e-3, "weight_decay": 0.01,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 50,
                          "eta_min": 1e-7},
            "total_iter": 50, "warmup_iter": -1}
    sched = build_schedule(topt)
    tx = make_optimizer(topt, sched)

    rng = np.random.RandomState(5)
    shapes = [(4, 7), (3,), (2, 3, 3)]
    init = [rng.randn(*s) for s in shapes]
    grads_seq = [[rng.randn(*s) for s in shapes] for _ in range(5)]

    # torch trajectory
    tparams = [torch.tensor(a, dtype=torch.float64, requires_grad=True)
               for a in init]
    topt_t = torch.optim.AdamW(tparams, lr=3e-3, betas=(0.9, 0.99),
                               eps=1e-8, weight_decay=0.01)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
        topt_t, T_max=50, eta_min=1e-7)
    for g in grads_seq:
        for p, gv in zip(tparams, g):
            p.grad = torch.tensor(gv, dtype=torch.float64)
        topt_t.step()
        tsched.step()

    # ours
    params = [jnp.asarray(a, jnp.float64) for a in init]
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update([jnp.asarray(x, jnp.float64) for x in g],
                                   state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    for got, want in zip(params, tparams):
        np.testing.assert_allclose(np.asarray(got),
                                   want.detach().numpy(), atol=1e-12)


def test_sr_train_step_runs_and_updates():
    """The TurtleSuper (x4 SR) variant trains: LQ-sized cache, 4x output
    against the HR ground truth, finite loss, params move."""
    cfg = model_config_from_options(tiny_opt("TurtleSuper_t1_arch"))
    assert cfg.variant == "sr" and cfg.sr_scale == 4
    tx = make_optimizer(TRAIN_OPT, build_schedule(TRAIN_OPT))
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32, remat=True,
                           donate=False)
    state = TrainState.create(params, tx)
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(1, 2, 16, 16, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 2, 64, 64, 3), jnp.float32)
    state2, logs = step(state, lq, gt)
    assert np.isfinite(float(logs["l_pix"]))
    moved = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a)
                                                          - np.asarray(b)))),
                         state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_bptt_grad_parity_sr():
    # 2 frames (not 3): the fp64 4x-output backward costs ~6 min at 3
    _bptt_grad_parity("TurtleSuper_t1_arch", scale=4, t_frames=2)
