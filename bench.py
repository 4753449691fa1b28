"""Headline benchmark: GoPro 1280x720 deblurring throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 30 frames/s on one v5e chip.

The reference evaluates 720p through 320px tiles with per-tile KV caches
round-tripped to CPU (inference.py:172-246) because of GPU memory; on a
16 GB v5e the whole frame fits in bf16, so the benchmark streams whole
frames through one jitted step with the cache resident on device — the same
protocol as the reference's FPS harness (turtle_arch.py:1066-1103: warmup
then steady-state timing) at the BASELINE.json resolution.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _watchdog(seconds: float):
    """Hard exit if the bench wedges (the axon tunnel hangs device
    acquisition indefinitely when it is down, and SIGALRM can't interrupt
    a blocked C++ backend-init call — a daemon thread + os._exit can)."""
    def fire():
        sys.stderr.write(
            f"bench.py: no result after {seconds:.0f}s — TPU tunnel "
            "down or compile wedged; aborting instead of hanging.\n")
        sys.stderr.flush()
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _wait_for_tunnel(total_s: float, probe_s: float = 90.0) -> bool:
    """Probe device acquisition in a SUBPROCESS (an in-process attempt
    blocks uninterruptibly in backend init when the axon tunnel is down)
    and retry for a bounded window, so a transiently-down tunnel recovers
    instead of the whole bench hanging until the watchdog fires."""
    import subprocess
    deadline = time.monotonic() + total_s
    first = True
    fast_fails = 0  # consecutive quick nonzero exits = deterministic error
    while True:
        try:
            t0 = time.monotonic()
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_s, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
            # a probe that ERRORS quickly (vs hanging) means the backend is
            # reporting hard-down, not wedged; a few of those in a row won't
            # change for the rest of the window — fail fast instead of
            # burning the full retry budget on a deterministic error
            if time.monotonic() - t0 < probe_s / 3:
                fast_fails += 1
                if fast_fails >= 4:
                    sys.stderr.write(
                        "bench.py: device acquisition erroring fast and "
                        f"consistently ({fast_fails} probes) — hard-down, "
                        "not retrying further.\n")
                    return False
            else:
                fast_fails = 0
        except subprocess.TimeoutExpired:
            fast_fails = 0
        if time.monotonic() >= deadline:
            return False
        if first:
            sys.stderr.write("bench.py: TPU tunnel not responding; "
                             f"retrying for up to {total_s:.0f}s...\n")
            sys.stderr.flush()
            first = False
        time.sleep(30)


def main():
    if not _wait_for_tunnel(float(os.environ.get("BENCH_TUNNEL_WAIT_S",
                                                 "900"))):
        sys.stderr.write("bench.py: TPU tunnel down (device acquisition "
                         "failed every probe); aborting.\n")
        sys.exit(2)
    # armed AFTER the tunnel wait so the retry window doesn't eat the
    # compile+run budget (and a long BENCH_TUNNEL_WAIT_S isn't silently
    # capped by the watchdog)
    dog = _watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "2400")))
    import jax

    # persistent compilation cache: repeated driver runs skip the ~5 min
    # cold compile of the 720p graph
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.models.turtle import forward, init_cache, init_params

    import dataclasses

    opt = load_options(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "options", "Turtle_Deblur_Gopro.yml"), is_train=False)
    cfg = model_config_from_options(opt)
    cfg = dataclasses.replace(
        cfg, kernels=os.environ.get("TURTLE_KERNELS", "pallas"))

    dtype = jnp.bfloat16
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda p: p.astype(dtype), params)

    b, h, w = 1, 720, 1280
    cache = init_cache(cfg, b, h, w, dtype=dtype)

    # donating the cache lets XLA update the ring buffers IN PLACE
    # (dynamic_update_slice aliases the donated input) instead of copying
    # the multi-hundred-MB SAB caches every frame
    step = jax.jit(lambda p, x, c: forward(p, cfg, x, c),
                   donate_argnums=(2,))

    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(b, 2, h, w, 3), dtype) for _ in range(4)]

    # warmup: compile + populate cache. NOTE: through the axon tunnel
    # block_until_ready can return before remote execution finishes, so all
    # timing uses an explicit device->host fetch as the sync point.
    out, cache_w = None, cache
    for i in range(3):
        out, cache_w = step(params, frames[i % len(frames)], cache_w)
    np.asarray(out[0, 0, 0, :])

    n_iters = int(os.environ.get("BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    c = cache_w
    for i in range(n_iters):
        out, c = step(params, frames[i % len(frames)], c)
    np.asarray(out[0, 0, 0, :])  # full-pipeline sync
    dt = time.perf_counter() - t0

    fps = n_iters / dt
    baseline = 30.0
    line = {
        "metric": "gopro_720p_deblur_fps_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
    }
    # layout/VMEM env overrides change what is measured — stamp them so a
    # forced A/B run can never masquerade as the default configuration
    env_overrides = {k: os.environ[k]
                     for k in ("TURTLE_CHAN_MAJOR", "TURTLE_CHAN_MAJOR_NEW",
                      "TURTLE_KERNEL_VMEM_MB", "TURTLE_CHM_IN_FFN",
                      "TURTLE_SAB_PERFRAME")
                     if k in os.environ}
    if env_overrides:
        line["env_overrides"] = env_overrides
    print(json.dumps(line))
    dog.cancel()


if __name__ == "__main__":
    main()
