"""Cost attribution inside the fused GFFW kernel (the round-5 frontier).

Times the gate kernel at the two dominant bench shapes under the
TURTLE_ABLATE debug modes (kernels/ffn.py): full, notaps (centre tap
only — no rolls/masks/neighbour adds), nogelu (identity activation),
noln (plain cast). Differences attribute the kernel's device time to the
dw tap machinery, the gelu polynomial and the LN. Each mode runs in a
SUBPROCESS (the knob is read at import). The ablated kernels produce
WRONG values — this tool is measurement-only.

Usage: python tools/ablate_ffn.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CHILD = r"""
import time
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, %r)
from turtlevsr_tpu.models import blocks as B

shapes = [("dec1 gate (cm, e=160)", 736, 1280, 64),
          ("enc3 gate (tm, e=640)", 184, 320, 256)]
out = {}
for name, h, w, c in shapes:
    spec = B.BlockSpec(attn_type="NoAttn", ffw_type="GFFW", dim=c,
                       num_heads=1, ffn_expansion_factor=2.5, bias=False,
                       layernorm_bias=False, num_frames_tocache=0,
                       kernels="pallas")
    p = B.attn_block_init(jax.random.PRNGKey(0), spec, jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, h, w, c) * 0.3,
                    jnp.bfloat16)
    fn = jax.jit(lambda x_, p=p, spec=spec: B._fused_ffn_half(p, x_, spec))
    y = fn(x); np.asarray(y[..., :2], np.float32)
    t0 = time.time()
    for _ in range(60):
        y = fn(x)
    np.asarray(y[..., :2], np.float32)
    out[name] = (time.time() - t0) / 60 * 1000
print("RESULT " + __import__("json").dumps(out))
""" % (ROOT,)


def run(mode):
    env = dict(os.environ)
    if mode:
        env["TURTLE_ABLATE"] = mode
    else:
        env.pop("TURTLE_ABLATE", None)
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=2400)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    sys.exit(f"mode {mode or 'full'} failed:\n{r.stdout}\n{r.stderr}")


def main():
    rows = {}
    for mode in ("", "notaps", "nogelu", "noln"):
        rows[mode or "full"] = run(mode)
        print(f"{mode or 'full':8s} " + json.dumps(rows[mode or "full"]),
              flush=True)
    full = rows["full"]
    print("\n-- attribution (full minus ablated; ms/call, iters=60,"
          " ~0.7 ms tunnel overhead in every line) --")
    for shape in full:
        taps = full[shape] - rows["notaps"][shape]
        gelu = full[shape] - rows["nogelu"][shape]
        ln = full[shape] - rows["noln"][shape]
        rest = full[shape] - taps - gelu - ln
        print(f"{shape}: total {full[shape]:.2f} = taps/rolls {taps:.2f}"
              f" + gelu {gelu:.2f} + LN {ln:.2f} + pw/rest {rest:.2f}")


if __name__ == "__main__":
    main()
