"""Complexity / speed harness — the reference's
``python basicsr/models/archs/turtle_arch.py`` benchmark
(turtle_arch.py:1065-1127: ptflops MACs + params + warmed steady-state FPS
on a (2, 3, 256, 256) input).

    python -m turtlevsr_tpu.cli.bench -opt options/Turtle_Desnow.yml \\
        [--size 256 256] [--iters 100] [--kernels pallas]

FLOPs come from XLA's own cost analysis of the compiled step (instead of
ptflops' module hooks); timing syncs with a device->host fetch.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", "--opt", required=True)
    p.add_argument("--size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--kernels", choices=["xla", "pallas"], default="pallas")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.models.turtle import forward, init_cache, init_params

    opt = load_options(args.opt, is_train=False)
    cfg = dataclasses.replace(model_config_from_options(opt),
                              kernels=args.kernels)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = jax.tree.map(lambda a: a.astype(dtype),
                          init_params(jax.random.PRNGKey(0), cfg))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Params: {n_params / 1e6:.2f} M")

    h, w = args.size
    cache = init_cache(cfg, 1, h, w, dtype=dtype)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 2, h, w, 3), dtype)
    step = jax.jit(lambda p, xx, c: forward(p, cfg, xx, c))

    try:
        ca = step.lower(params, x, cache).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"FLOPs/frame (XLA): {ca.get('flops', 0) / 1e9:.2f} G "
              f"(~{ca.get('flops', 0) / 2e9:.2f} GMac)")
        print(f"HBM bytes/frame:   {ca.get('bytes accessed', 0) / 1e9:.2f} GB")
    except Exception as e:  # cost analysis is best-effort
        print(f"(cost analysis unavailable: {e})")

    out, c = step(params, x, cache)
    np.asarray(out[0, 0, 0, :])
    for _ in range(args.warmup - 1):
        out, c = step(params, x, c)
    np.asarray(out[0, 0, 0, :])

    t0 = time.perf_counter()
    for i in range(args.iters):
        out, c = step(params, x, c)
        if (i + 1) % 50 == 0:
            np.asarray(out[0, 0, 0, :])
            fps = (i + 1) / (time.perf_counter() - t0)
            print(f"Done image [{i + 1:<3}/ {args.iters}], "
                  f"fps: {fps:.1f} img / s, "
                  f"times per image: {1000 / fps:.1f} ms / img", flush=True)
    np.asarray(out[0, 0, 0, :])
    dt = time.perf_counter() - t0
    fps = args.iters / dt
    print(f"Overall fps: {fps:.1f} img / s, "
          f"times per image: {1000 / fps:.1f} ms / img")


if __name__ == "__main__":
    main()
