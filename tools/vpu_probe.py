"""On-chip VPU primitive-rate probe (round-5 instrument).

The xplane trace cannot attribute inside Pallas custom-calls (PROFILE_r04
shows 0.0 TF/s / 0.0 GB/s for 78.8% of device time), so the structural
cost model in tools/vpu_ledger.py needs MEASURED per-primitive rates for
the operations the fused kernels are made of:

  fma        — one elementwise a*x+b VMEM pass (the pass-cost floor:
               an 8 MB carry cannot stay in registers across iterations,
               so this is bandwidth+issue, not peak FLOPs)
  taps9      — the REAL dw-tap bundle as the kernels execute it: 3 rolled
               bases (2 wrap-mask multiplies) and 9 broadcast FMAs fused
               in ONE pass — the ledger counts tap-bundle passes
  gelu       — one pass of the kernels' own _gelu_exact (rational erf)
  ln_lane    — one pass of the real _ln_2d_f32 over (rows, 64): the
               pixels-major channel LN (half-filled lane reduces)
  ln_sub     — one pass of the real _ln_t_f32 over (64, rows): the r5
               transposed LN (sublane reduces)
  lane_red / sub_red — bare mean-reduce rates (the 12.8x orientation gap
               that motivated the transposed LN)

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

ROWS, COLS = 1024, 2048         # fp32 block: 8 MB
# Inner repeats per kernel pass, as a ROLLED fori_loop: a python-unrolled
# R=256 chain made the remote Mosaic compile pathological (>18 min,
# killed — same failure class as the r4 unrolled-strip megakernel).
R = 256


def _probe_kernel(x_ref, out_ref, *, op: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from turtlevsr_tpu.kernels.ffn import (_erf_rational, _gelu_exact,
                                           _ln_2d_f32, _ln_t_f32)

    x = x_ref[:]

    def loop(body, init, reps=R):
        return jax.lax.fori_loop(0, reps, body, init)

    if op == "copy":
        out_ref[:] = x + 1.0   # overhead baseline, subtracted out
        return
    if op == "fma":
        acc = loop(lambda i, v: v * 1.000001 + 0.000001, x)
    elif op == "taps9":
        # the fused per-strip tap bundle of _cm_chain/_tm_chain: 2 rolls
        # with wrap masks + the centre base, 3 broadcast FMAs per base
        col = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (1, COLS), 1),
            jnp.int32(640))
        cml = (col != 0).astype(jnp.float32)
        cmr = (col != 639).astype(jnp.float32)

        def taps(i, v):
            acc = jnp.zeros_like(v)
            for dj, base in ((0, v),
                             (-1, pltpu.roll(v, shift=1, axis=1) * cml),
                             (1, pltpu.roll(v, shift=COLS - 1, axis=1)
                              * cmr)):
                for k in range(3):
                    acc = acc + base * (0.1 + 0.01 * k + 0.001 * dj)
            return acc
        acc = loop(taps, x)
    elif op == "gelu":
        acc = loop(lambda i, v: _gelu_exact(v) * 0.9 + 0.05, x)
    elif op == "ln_lane":
        g = jnp.ones((64,), jnp.float32)

        def lnl(i, v):
            y = _ln_2d_f32(v[:, 0:64], g, None, "bias_free")
            return v + jnp.pad(y * 1e-6, ((0, 0), (0, COLS - 64)))
        acc = loop(lnl, x, reps=16 * R)
    elif op == "ln_sub":
        gc = jnp.ones((64, 1), jnp.float32)

        def lns(i, v):
            y = _ln_t_f32(v[0:64, :], gc, None, "bias_free")
            return v + jnp.pad(y * 1e-6, ((0, ROWS - 64), (0, 0)))
        acc = loop(lns, x, reps=16 * R)
    elif op == "erf":
        acc = loop(lambda i, v: _erf_rational(v) * 1e-6 + x, x)
    elif op == "roll":
        acc = loop(lambda i, v: pltpu.roll(v, shift=1, axis=1), x)
    elif op == "lane_red":
        # (rows, 64) half-filled lane layout, like the c=64 channel LN
        v = x[:, 0:64]
        # 16x repeats: one (rows, 64) reduce is small next to the copy
        # baseline (the full-block ops above process 32x more elements)
        s = loop(lambda i, s: s + jnp.mean(jnp.abs(v - s), axis=-1,
                                           keepdims=True),
                 jnp.zeros((ROWS, 1), jnp.float32), reps=16 * R)
        out_ref[0:ROWS, 0:1] = s
        out_ref[0:ROWS, 1:COLS] = x[0:ROWS, 1:COLS]
        return
    elif op == "sub_red":
        # (64, cols) sublane layout, like the transposed LN (r5)
        v = x[0:64, :]
        s = loop(lambda i, s: s + jnp.mean(jnp.abs(v - s), axis=0,
                                           keepdims=True),
                 jnp.zeros((1, COLS), jnp.float32), reps=64 * R)
        out_ref[0:1, :] = s
        out_ref[1:ROWS, :] = x[1:ROWS, :]
        return
    elif op == "mask_mul":
        col = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (1, COLS), 1),
            jnp.int32(640))
        m = (col != 0).astype(jnp.float32)
        acc = loop(lambda i, v: v * m, x)
    else:
        raise ValueError(op)
    out_ref[:] = acc


def probe(op: str, iters: int = 30):
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    ))
    y = fn(x)
    np.asarray(y[:1, :2])
    t0 = time.time()
    for _ in range(iters):
        y = fn(x)
    np.asarray(y[:1, :2])
    dt = (time.time() - t0) / iters
    return {"sec_per_pass": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="VPU_PROBE.json")
    args = ap.parse_args()

    out = {"rows": ROWS, "cols": COLS, "repeat": R}
    base = probe("copy")
    out["overhead_ms"] = round(base["sec_per_pass"] * 1e3, 3)
    print(f"{'copy':9s} baseline {base['sec_per_pass']*1e3:.3f} ms/pass",
          flush=True)
    for op in ("fma", "taps9", "gelu", "ln_lane", "ln_sub", "erf", "roll",
               "lane_red", "sub_red", "mask_mul"):
        r = probe(op)
        # subtract the dispatch/IO baseline so the rate reflects compute
        r = {"sec_per_pass": max(r["sec_per_pass"] - base["sec_per_pass"],
                                 1e-6)}
        if op == "lane_red":
            elems = ROWS * 64 * 16 * R
        elif op == "sub_red":
            elems = 64 * COLS * 64 * R
        elif op == "ln_lane":
            elems = ROWS * 64 * 16 * R  # elements actually normalised
        elif op == "ln_sub":
            elems = 64 * COLS * 16 * R
        else:
            elems = ROWS * COLS * R
        r["elem_per_sec"] = elems / r["sec_per_pass"]
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
