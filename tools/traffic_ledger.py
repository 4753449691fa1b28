"""Pre-fusion HBM-traffic ledger for one frame step, attributed to source.

Walks the jaxpr of `forward` (no device needed — abstract eval) and sums
operand+result bytes of every equation, grouped by the model source
function that emitted it (from the primitive's source_info). This is the
PRE-FUSION upper bound — XLA fuses elementwise chains so the absolute
numbers overshoot the cost-analysis measurement — but the per-function
RANKING localizes where the real traffic lives, which is what picks the
next fusion target (the analytic floor lives in tools/roofline.py).

Pallas kernel calls appear as single `pallas_call` eqns whose operand/
result bytes ARE their true HBM traffic (everything else stays in VMEM),
so the fused paths are counted honestly.

Usage: python tools/traffic_ledger.py [--size 720 1280] [--top 30]
       [--kernels pallas|xla] [--opt options/Turtle_Deblur_Gopro.yml]
"""

import argparse
import collections
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _eqn_site(eqn) -> str:
    """Innermost model-code frame of the eqn's source info."""
    try:
        frames = list(eqn.source_info.traceback.frames)
    except Exception:
        return "?"
    for fr in frames:
        fn = fr.file_name
        if "turtlevsr_tpu" in fn:
            base = os.path.basename(fn)
            return f"{base}:{fr.function_name}"
    return "jax-internal"


def _bytes(avals) -> int:
    tot = 0
    for a in avals:
        try:
            tot += a.size * a.dtype.itemsize
        except Exception:
            pass
    return tot


def ledger(opt_path: str, h: int, w: int, kernels: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.models.turtle import forward, init_cache, init_params

    opt = load_options(opt_path, is_train=False)
    cfg = dataclasses.replace(model_config_from_options(opt),
                              kernels=kernels)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    cache = init_cache(cfg, 1, h, w, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 2, h, w, 3), jnp.bfloat16)

    jaxpr = jax.make_jaxpr(lambda p, xx, c: forward(p, cfg, xx, c))(
        params, x, cache)

    by_site = collections.Counter()
    by_prim = collections.Counter()
    free_prims = collections.Counter()
    # prims XLA lowers to bitcasts or fuses into neighbours almost always —
    # reported separately so they don't drown the ledger in phantom bytes
    LIKELY_FREE = {"reshape", "convert_element_type", "broadcast_in_dim",
                   "add", "mul", "div", "sub", "max", "min", "exp", "rsqrt",
                   "square", "neg", "reduce_sum", "reduce_max", "select_n",
                   "integer_pow", "sign", "abs", "log", "tanh", "erf",
                   "clamp", "stop_gradient", "iota", "squeeze"}

    def walk(jp):
        for eqn in jp.eqns:
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None and eqn.primitive.name != "pallas_call":
                walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
                continue
            # dedupe operands by var identity: e.g. the FFN kernel streams
            # the SAME input buffer through three halo block specs — that's
            # one HBM read, not three
            seen, in_avals = set(), []
            for v in eqn.invars:
                if not hasattr(v, "aval"):
                    continue
                if id(v) in seen:
                    continue
                seen.add(id(v))
                in_avals.append(v.aval)
            b = _bytes(in_avals) + _bytes([v.aval for v in eqn.outvars])
            if b < (1 << 20):
                continue  # skip sub-MB noise
            name = eqn.primitive.name
            if name in LIKELY_FREE:
                free_prims[name] += b
                continue
            by_site[_eqn_site(eqn)] += b
            by_prim[name] += b

    walk(jaxpr.jaxpr)
    return by_site, by_prim, free_prims


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    ap.add_argument("--size", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--kernels", default="pallas")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    by_site, by_prim, free = ledger(args.opt, *args.size,
                                    kernels=args.kernels)
    tot = sum(by_site.values())
    print(f"pre-fusion ledger, one {args.size[0]}x{args.size[1]} frame, "
          f"kernels={args.kernels}: {tot/1e9:.1f} GB copy/compute traffic "
          f"(>=1MB eqns; likely-fused elementwise/bitcast prims reported "
          f"separately: {sum(free.values())/1e9:.1f} GB)\n")
    print("-- by model source function --")
    for site, b in by_site.most_common(args.top):
        print(f"{b/1e9:8.2f} GB  {100*b/tot:5.1f}%  {site}")
    print("\n-- by primitive --")
    for prim, b in by_prim.most_common(15):
        print(f"{b/1e9:8.2f} GB  {100*b/tot:5.1f}%  {prim}")
    print("\n-- likely fused away by XLA (not in the totals above) --")
    for prim, b in free.most_common(8):
        print(f"{b/1e9:8.2f} GB  {prim}")


if __name__ == "__main__":
    main()
