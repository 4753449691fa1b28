"""Per-level timing of the Turtle U-Net at a given resolution on TPU.

Times each encoder/latent/decoder level block in isolation at its in-context
spatial shape, for both kernel backends. Device sync uses an explicit
device->host fetch (block_until_ready returns early through the axon
tunnel).

Usage: python tools/profile_levels.py [H W] [--opt options/X.yml]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", nargs="*", type=int, default=[720, 1280])
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--kernels", default="xla,pallas")
    args = ap.parse_args()
    h0, w0 = (args.size + [720, 1280])[:2]

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.models import turtle as T

    opt = load_options(args.opt, is_train=False)
    base_cfg = model_config_from_options(opt)
    hp, wp = T.padded_hw(base_cfg, h0, w0)
    dt = jnp.bfloat16

    levels = [
        ("enc1", "enc1", 1, 0), ("enc2", "enc2", 2, 1),
        ("enc3", "enc3", 4, 2), ("latent", "latent", 8, None),
        ("dec3", "dec3", 4, 5), ("dec2", "dec2", 6, 6),
        ("dec1", "dec1", 8, 7), ("refinement", "refinement", 1, None),
    ]
    name_map = {"enc1": "encoder_level1", "enc2": "encoder_level2",
                "enc3": "encoder_level3", "latent": "latent",
                "dec3": "decoder_level3", "dec2": "decoder_level2",
                "dec1": "decoder_level1", "refinement": "refinement"}
    div_map = {"enc1": 1, "enc2": 2, "enc3": 4, "latent": 8, "dec3": 4,
               "dec2": 2, "dec1": 1, "refinement": 1}

    for kern in args.kernels.split(","):
        cfg = dataclasses.replace(base_cfg, kernels=kern)
        params = T.init_params(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda p: p.astype(dt), params)
        cache = T.init_cache(cfg, 1, h0, w0, dtype=dt)
        slot_of = {"enc1": 0, "enc2": 1, "enc3": 2, "dec3": 5, "dec2": 6,
                   "dec1": 7}
        print(f"== kernels={kern}  ({hp}x{wp} padded) ==", flush=True)
        total = 0.0
        for key, lvl_name, _, _slot in levels:
            lvl = getattr(cfg, lvl_name if lvl_name != "refinement"
                          else "refinement")
            div = div_map[key]
            hh, ww = hp // div, wp // div
            x = jnp.ones((1, hh, ww, lvl.dim), dt)
            pname = name_map[key]
            if key == "latent":
                fn = jax.jit(lambda x, c3=cache[3], c4=cache[4]:
                             T.latent_block_apply(params[pname], x, cfg,
                                                  cfg.latent, c3, c4)[0])
            else:
                slot = cache[slot_of[key]] if key in slot_of else None
                fn = jax.jit(
                    lambda x, s=slot, p=params[pname], lv=lvl:
                    T.level_block_apply(p, x, cfg, lv, s)[0])
            y = fn(x)
            sync(y)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = fn(x)
            sync(y)
            ms = (time.perf_counter() - t0) / args.iters * 1000
            total += ms
            print(f"  {key:11s} {hh:4d}x{ww:<4d} c={lvl.dim:<4d} "
                  f"blocks={lvl.num_blocks:<3d} {ms:8.2f} ms", flush=True)
        print(f"  {'TOTAL':11s} {'':16s} {total:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
