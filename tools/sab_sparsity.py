"""SAB far-key occupancy: the data-backed go/no-go on sparse @v (r5).

The only algorithmic perf lever left standing after rounds 2-4 is SAB
attention sparsity (top-5 + L1<=4-local keeps <= ~46 of the keys per
query row — turtle_t1_arch.py:588-596), parked in r3 because with
RANDOM-INIT weights the top-5 key positions are uniformly spread, so
every 128-key block is touched by some query in a kernel block-row and a
block-bitmap @v loop saturates to dense. This tool MEASURES that
distribution — random init vs. weights trained by tools/train_smoke.py —
and records the decision quantity directly:

  block_occupancy = fraction of (query-chunk r=256 x key-block 128) tiles
                    holding at least one nonzero probability
                    (= the fraction of dense @v work a block-skipping
                    kernel would still do, lower bound)
  far_fraction    = fraction of nonzero probs OUTSIDE the L1<=4 local
                    band (what a banded kernel must gather)

Runs on CPU (xla path, fp32) — the occupancy statistics don't need the
chip. Streaming state is threaded so late frames see a full cache ring.

Usage:
  python tools/train_smoke.py                 # produces trained params
  python tools/sab_sparsity.py [--size 192 192] [--frames 6]
                               [--params /tmp/turtle_smoke_params.npz]
                               [--json SAB_SPARSITY.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def synth_stream(rng, n, h, w):
    """Moving low-frequency pattern + noise: video-like, not pure noise."""
    base = rng.rand(h * 2, w * 2, 3).astype(np.float32)
    for _ in range(3):  # cheap blur
        base = 0.5 * base + 0.25 * np.roll(base, 1, 0) \
            + 0.25 * np.roll(base, 1, 1)
    frames = []
    for t in range(n):
        dy, dx = 3 * t, 5 * t
        fr = base[dy:dy + h, dx:dx + w]
        fr = np.clip(fr + rng.randn(h, w, 3).astype(np.float32) * 0.01,
                     0, 1)
        frames.append(fr)
    return frames


def occupancy_stats(taps, r=256, kb=128):
    """Aggregate the collected (probs (B, NF, HWq, HWk), wq) tensors."""
    tiles = touched = 0
    nz_total = far_total = 0
    rows = 0
    for a, wq in taps:
        a = np.asarray(a)   # sink appends unconverted (deadlock avoidance)
        b, nf, hwq, hwk = a.shape
        nz = a > 0
        # far fraction: nonzeros outside the L1<=4 local band
        qi = np.arange(hwq)
        ki = np.arange(hwk)
        dy = np.abs(qi[:, None] // wq - ki[None, :] // wq)
        dx = np.abs(qi[:, None] % wq - ki[None, :] % wq)
        local = (dy + dx) <= 4
        nz_total += int(nz.sum())
        far_total += int((nz & ~local[None, None]).sum())
        rows += b * nf * hwq
        # block occupancy at the kernel's tiling
        for qc in range(0, hwq, r):
            for kc in range(0, hwk, kb):
                blk = nz[:, :, qc:qc + r, kc:kc + kb]
                t_ = blk.any(axis=(2, 3))       # (B, NF)
                tiles += t_.size
                touched += int(t_.sum())
    return {
        "block_occupancy": round(touched / max(tiles, 1), 4),
        "far_fraction_of_nonzeros": round(far_total / max(nz_total, 1), 4),
        "nonzeros_per_row": round(nz_total / max(rows, 1), 1),
        "tiles": tiles,
    }


def run(params, cfg, frames, forward, init_cache):
    import jax
    import jax.numpy as jnp

    from turtlevsr_tpu.models import blocks as B

    h, w = frames[0].shape[:2]
    cache = init_cache(cfg, 1, h, w, dtype=jnp.float32)
    step = jax.jit(lambda p, xx, c: forward(p, cfg, xx, c))
    taps = []
    B._SAB_PROBS_TAP = taps
    try:
        prev = frames[0]
        for t, fr in enumerate(frames):
            pair = np.stack([prev, fr])[None]
            out, cache = step(params, jnp.asarray(pair, jnp.float32), cache)
            # block BEFORE clearing: unordered debug callbacks may still be
            # in flight, and a racing clear() makes the kept-tap set vary
            # between runs (observed 44 vs 110 tiles in the r5 artifact —
            # the ratio statistics are normalised so the comparison holds,
            # but determinism is better)
            jax.block_until_ready(out)
            prev = fr
            if t < len(frames) - 2:
                taps.clear()   # keep only late frames (full cache ring)
    finally:
        B._SAB_PROBS_TAP = None
    return occupancy_stats(taps)


def load_npz_params(path, target):
    import jax.tree_util as jtu

    data = np.load(path)
    flat, tree = jtu.tree_flatten_with_path(target)
    leaves = []
    for kp, v in flat:
        key = jtu.keystr(kp)
        if key not in data:
            raise KeyError(f"{key} missing from {path}")
        leaves.append(data[key].astype(np.asarray(v).dtype))
    return jtu.tree_unflatten(jtu.tree_structure(target), leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    ap.add_argument("--size", type=int, nargs=2, default=[192, 192])
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--params", default="/tmp/turtle_smoke_params.npz")
    ap.add_argument("--json", default="SAB_SPARSITY.json")
    ap.add_argument("--only", choices=["both", "random", "trained"],
                    default="both",
                    help="run one pass and print its stats as JSON (used "
                         "internally: a second in-process pass wedges on "
                         "the debug-callback/jit interaction, so 'both' "
                         "runs each pass in its own subprocess)")
    args = ap.parse_args()

    if args.only == "both":
        import subprocess

        stats = {}
        for which in ("random", "trained"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--opt", args.opt, "--size", str(args.size[0]),
                 str(args.size[1]), "--frames", str(args.frames),
                 "--params", args.params, "--json", args.json,
                 "--only", which],
                capture_output=True, text=True, timeout=7200)
            for line in r.stdout.splitlines():
                if line.startswith("STATS "):
                    stats[which] = json.loads(line[6:])
            print(which, json.dumps(stats.get(which)), flush=True)
            if which == "random" and "random" not in stats:
                sys.exit(f"random pass failed:\n{r.stdout}\n{r.stderr}")
        _write_artifact(args, stats.get("random"), stats.get("trained"))
        return

    import jax

    jax.config.update("jax_platforms", "cpu")   # xla path, stats only

    import dataclasses

    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.models.turtle import forward, init_cache, init_params

    opt = load_options(args.opt, is_train=False)
    cfg = dataclasses.replace(model_config_from_options(opt), kernels="xla")

    rng = np.random.RandomState(0)
    frames = synth_stream(rng, args.frames, *args.size)

    params0 = init_params(jax.random.PRNGKey(0), cfg)
    if args.only == "trained":
        if not os.path.exists(args.params):
            sys.exit(f"no trained params at {args.params}")
        params0 = load_npz_params(args.params, params0)
    stats = run(params0, cfg, frames, forward, init_cache)
    print("STATS " + json.dumps(stats), flush=True)


def _write_artifact(args, rand_stats, trained_stats):
    occ_t = (trained_stats or rand_stats)["block_occupancy"]
    go = occ_t < 0.6
    import json as _json  # noqa: F811 (function scope)
    art = {
        "metric": "sab_far_key_block_occupancy",
        "size": args.size, "frames": args.frames,
        "random_init": rand_stats,
        "trained": trained_stats,
        "trained_params": args.params if trained_stats else None,
        "decision": ("GO: block-bitmap @v can skip >40% of key blocks"
                     if go else
                     "NO-GO: >=60% of (256-query x 128-key) tiles hold a "
                     "nonzero probability — a block-skipping @v saves too "
                     "little over dense to pay for its bookkeeping; dense "
                     "@v stays (MXU-saturated at 176 TF/s, PROFILE_r04)"),
        "note": "synthetic moving-pattern stream; trained weights come "
                "from the ~300-iter reference-recipe smoke "
                "(tools/train_smoke.py) — short-horizon training on "
                "synthetic data, a caveat against over-reading; published "
                "checkpoints/datasets are not available in this "
                "environment (BASELINE.md)",
    }
    import subprocess
    import time
    try:
        art["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        pass
    art["date"] = time.strftime("%Y-%m-%d")
    with open(args.json, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
