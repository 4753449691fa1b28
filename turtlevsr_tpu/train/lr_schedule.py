"""Learning-rate schedules as pure ``step -> lr`` functions (optax style).

Reproduces the reference scheduler zoo (basicsr/models/lr_scheduler.py and
the TrueCosineAnnealingLR alias for torch CosineAnnealingLR,
base_model.py:82-113) plus the linear warmup override
(base_model.py:163-185). Schedulers step once per iteration, so torch's
``last_epoch`` equals the 0-based optax step count.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def true_cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form."""

    def sched(step):
        s = jnp.minimum(step, t_max).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * s / t_max))

    return sched


def cosine_annealing_restart(base_lr: float, periods: Sequence[int],
                             restart_weights: Sequence[float] = (1.0,),
                             eta_min: float = 0.0):
    """lr_scheduler.CosineAnnealingRestartLR:141-189 — piecewise cosine
    cycles; the cycle whose cumulative period first covers the step wins."""
    cumulative = [sum(periods[: i + 1]) for i in range(len(periods))]

    def sched_final(step):
        s = jnp.asarray(step, jnp.float32)
        out = jnp.asarray(base_lr, jnp.float32)
        prev_cum = 0.0
        first = True
        for period, cum, w in zip(periods, cumulative, restart_weights):
            val = eta_min + w * 0.5 * (base_lr - eta_min) * (
                1.0 + jnp.cos(jnp.pi * (s - prev_cum) / period))
            if first:
                out, first = val, False
            else:
                out = jnp.where(s > prev_cum, val, out)
            prev_cum = float(cum)
        return out

    return sched_final


def multistep_restart(base_lr: float, milestones: Sequence[int],
                      gamma: float = 0.1, restarts: Sequence[int] = (0,),
                      restart_weights: Sequence[float] = (1.0,)):
    """lr_scheduler.MultiStepRestartLR:12-52 (stateful in torch; here the
    closed form: lr = weight_of_last_restart * base * gamma^(#milestones
    passed since that restart))."""
    milestones = sorted(milestones)
    restarts = list(restarts)

    def sched(step):
        s = jnp.asarray(step, jnp.int32)
        lr = jnp.asarray(base_lr, jnp.float32)
        # restart weight of the most recent restart <= s
        w = jnp.asarray(restart_weights[0] if restarts and restarts[0] == 0
                        else 1.0, jnp.float32)
        for r, rw in zip(restarts, restart_weights):
            w = jnp.where(s >= r, jnp.float32(rw), w)
        # count milestones passed since most recent restart
        count = jnp.zeros((), jnp.int32)
        for m in milestones:
            passed = s >= m
            after_restart = jnp.ones((), bool)
            for r in restarts:
                after_restart = jnp.logical_and(
                    after_restart, jnp.logical_or(m > r, s < r))
            count = count + jnp.where(jnp.logical_and(passed, after_restart),
                                      1, 0)
        return lr * w * jnp.power(jnp.float32(gamma), count.astype(jnp.float32))

    return sched


def linear_lr(base_lr: float, total_iter: int):
    """lr_scheduler.LinearLR:54-75."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        return base_lr * (1.0 - s / total_iter)

    return sched


def vibrate_lr(base_lr: float, total_iter: int):
    """lr_scheduler.VibrateLR:77-118 — decaying sawtooth."""
    t = total_iter // 80
    th = t // 2

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        process = s / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        ti = jnp.mod(jnp.asarray(step, jnp.int32), t).astype(jnp.float32)
        f2 = ti / th
        f2 = jnp.where(ti >= th, 2 - f2, f2)
        weight = f * f2
        weight = jnp.where(jnp.asarray(step, jnp.int32) < th,
                           jnp.maximum(weight, 0.1), weight)
        return base_lr * weight

    return sched


def with_warmup(sched: Callable, base_lr: float, warmup_iter: int):
    """Linear warmup override for the first warmup_iter iterations
    (base_model.py:163-185; warmup_iter <= 0 disables)."""
    if warmup_iter is None or warmup_iter <= 0:
        return sched

    def warmed(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr / warmup_iter * (s + 1.0)
        return jnp.where(s + 1.0 < warmup_iter, warm, sched(step))

    return warmed


def build_schedule(train_opt: dict) -> Callable:
    """Build the iteration schedule from an option file's ``train:`` section
    (keys as in options/*.yml: optim_g.lr, scheduler.type, ...)."""
    base_lr = float(train_opt["optim_g"]["lr"])
    sch = dict(train_opt.get("scheduler") or {"type": "TrueCosineAnnealingLR",
                                              "T_max": train_opt["total_iter"],
                                              "eta_min": 0})
    stype = sch.pop("type")
    total_iter = int(train_opt.get("total_iter", 0))
    if stype == "TrueCosineAnnealingLR":
        fn = true_cosine_annealing(base_lr, int(sch["T_max"]),
                                   float(sch.get("eta_min", 0)))
    elif stype == "CosineAnnealingRestartLR":
        fn = cosine_annealing_restart(base_lr, [int(p) for p in sch["periods"]],
                                      [float(w) for w in
                                       sch.get("restart_weights", [1.0])],
                                      float(sch.get("eta_min", 0)))
    elif stype in ("MultiStepLR", "MultiStepRestartLR"):
        fn = multistep_restart(base_lr, [int(m) for m in sch["milestones"]],
                               float(sch.get("gamma", 0.1)),
                               [int(r) for r in sch.get("restarts", [0])],
                               [float(w) for w in
                                sch.get("restart_weights", [1.0])])
    elif stype == "LinearLR":
        fn = linear_lr(base_lr, total_iter)
    elif stype == "VibrateLR":
        fn = vibrate_lr(base_lr, total_iter)
    else:
        raise NotImplementedError(f"Scheduler {stype} is not implemented")
    return with_warmup(fn, base_lr, int(train_opt.get("warmup_iter", -1)))
