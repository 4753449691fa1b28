"""On-chip VPU primitive-rate probe (round-5 instrument).

The xplane trace cannot attribute inside Pallas custom-calls (PROFILE_r04
shows 0.0 TF/s / 0.0 GB/s for 78.8% of device time), so the structural
cost model in tools/vpu_ledger.py needs MEASURED per-primitive rates for
the operations the fused kernels are made of:

  fma        — elementwise a*x+b chains (the dw tap multiply-adds)
  erf        — the rational gelu polynomial (_erf_rational, kernels/ffn.py)
  roll       — pltpu.roll on the lane axis (the ±1 column taps)
  lane_red   — jnp.mean over 64 half-filled lanes of (rows, 64)
               (the channel-LN reduces in pixels-major layout)
  sub_red    — jnp.mean over 64 sublanes of (64, cols)
               (the transposed-LN reduces, r5)
  mask_mul   — iota-derived (1, n) mask broadcast multiply

Each probe is a Pallas kernel over a VMEM-resident fp32 block, sized well
past the tunnel latency (iters >= 40, inner repeat R so per-iter work is
tens of ms). Rates are reported as ELEMENT-ops/s (elements processed x
inner repeats / time); the ledger multiplies them back against per-site
element counts. Numbers are for THIS chip (one v5e via axon).

Usage: python tools/vpu_probe.py [--json VPU_PROBE.json]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ROWS, COLS = 512, 2048          # fp32 block: 4 MB, well inside VMEM
R = 64                          # inner repeats per kernel pass


def _probe_kernel(x_ref, out_ref, *, op: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from turtlevsr_tpu.kernels.ffn import _erf_rational

    x = x_ref[:]
    acc = jnp.zeros_like(x)
    if op == "fma":
        v = x
        for _ in range(R):
            v = v * 1.000001 + 0.000001
        acc = v
    elif op == "erf":
        v = x
        for _ in range(R):
            v = _erf_rational(v) * 1e-6 + x   # keep the chain data-dependent
        acc = v
    elif op == "roll":
        v = x
        for _ in range(R):
            v = pltpu.roll(v, shift=1, axis=1)
        acc = v
    elif op == "lane_red":
        # (rows, 64) half-filled lane layout, like the c=64 channel LN
        v = x[:, 0:64]
        s = jnp.zeros((ROWS, 1), jnp.float32)
        for _ in range(R):
            s = s + jnp.mean(v + s, axis=-1, keepdims=True)
        out_ref[0:ROWS, 0:1] = s
        out_ref[0:ROWS, 1:COLS] = x[0:ROWS, 1:COLS]
        return
    elif op == "sub_red":
        # (64, cols) sublane layout, like the transposed LN (r5)
        v = x[0:64, :]
        s = jnp.zeros((1, COLS), jnp.float32)
        for _ in range(R):
            s = s + jnp.mean(v + s, axis=0, keepdims=True)
        out_ref[0:1, :] = s
        out_ref[1:ROWS, :] = x[1:ROWS, :]
        return
    elif op == "mask_mul":
        col = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (1, COLS), 1),
            jnp.int32(640))
        m = (col != 0).astype(jnp.float32)
        v = x
        for _ in range(R):
            v = v * m
        acc = v
    else:
        raise ValueError(op)
    out_ref[:] = acc


def probe(op: str, iters: int = 40):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np.random.RandomState(0).rand(ROWS, COLS) * 0.5 + 0.25,
                    jnp.float32)
    fn = jax.jit(pl.pallas_call(
        functools.partial(_probe_kernel, op=op),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    y = fn(x)
    np.asarray(y[:1, :2])
    t0 = time.time()
    for _ in range(iters):
        y = fn(x)
    np.asarray(y[:1, :2])
    dt = (time.time() - t0) / iters
    if op == "lane_red":
        elems = ROWS * 64 * R          # elements actually reduced
    elif op == "sub_red":
        elems = 64 * COLS * R
    else:
        elems = ROWS * COLS * R
    return {"sec_per_pass": dt, "elem_per_sec": elems / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="VPU_PROBE.json")
    args = ap.parse_args()

    out = {"rows": ROWS, "cols": COLS, "repeat": R}
    for op in ("fma", "erf", "roll", "lane_red", "sub_red", "mask_mul"):
        r = probe(op)
        out[op] = {k: (round(v, 6) if k == "sec_per_pass" else round(v / 1e9,
                                                                     3))
                   for k, v in r.items()}
        out[op]["unit"] = "Gelem/s"
        print(f"{op:9s} {out[op]['elem_per_sec']:>9.3f} Gelem/s "
              f"({out[op]['sec_per_pass'] * 1e3:.3f} ms/pass)", flush=True)

    import subprocess
    try:
        out["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        pass
    out["date"] = time.strftime("%Y-%m-%d")
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
