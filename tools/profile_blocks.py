"""Micro-profile of the hot Turtle sub-ops at their in-context 720p shapes.

Times, per decoder level (and enc3/latent), the pieces that make up a
Channel+GFFW block and a CHM block: projections, score einsums, the sparse
softmax, the attn@v contraction, the finish/projection chain. All timings
sync via device->host fetch (axon tunnel: block_until_ready returns early).

Usage: python tools/profile_blocks.py [H W] [--kernels pallas]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=60):
    fn_j = jax.jit(fn)
    y = fn_j(*args)
    np.asarray(jax.tree.leaves(y)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn_j(*args)
    np.asarray(jax.tree.leaves(y)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", nargs="*", type=int, default=[720, 1280])
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    ap.add_argument("--kernels", default="pallas")
    ap.add_argument("--levels", default="dec1,dec2,dec3")
    args = ap.parse_args()
    h0, w0 = (args.size + [720, 1280])[:2]

    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.models import turtle as T
    from turtlevsr_tpu.models import blocks as B

    opt = load_options(args.opt, is_train=False)
    cfg = model_config_from_options(opt)
    cfg = dataclasses.replace(cfg, kernels=args.kernels)
    hp, wp = T.padded_hw(cfg, h0, w0)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    div_map = {"enc3": 4, "latent": 8, "dec3": 4, "dec2": 2, "dec1": 1}
    slot_of = {"dec3": 5, "dec2": 6, "dec1": 7}

    cache = T.init_cache(cfg, 1, h0, w0, dtype=dt)

    for name in args.levels.split(","):
        lvl = getattr(cfg, name)
        div = div_map[name]
        h, w = hp // div, wp // div
        c = lvl.dim
        ws = 2 * lvl.scale_patchsize
        spec_chm = B.BlockSpec(
            attn_type="CHM", ffw_type=lvl.ffw_type, dim=c,
            num_heads=lvl.num_heads,
            ffn_expansion_factor=cfg.ffn_expansion_factor, bias=cfg.bias,
            layernorm_bias=cfg.layernorm_bias,
            num_frames_tocache=lvl.num_frames_tocache,
            scale_patchsize=lvl.scale_patchsize, kernels=args.kernels)
        spec_ch = dataclasses.replace(spec_chm, attn_type="Channel")
        x = jax.random.normal(key, (1, h, w, c), dt)
        print(f"== {name}: {h}x{w} c={c} ws={ws} heads={lvl.num_heads} "
              f"blocks={lvl.num_blocks} ==", flush=True)

        # full blocks
        p_ch = B.attn_block_init(key, spec_ch, dt)
        ms = timeit(lambda x: B.attn_block_apply(p_ch, x, spec_ch, None)[0], x)
        print(f"  Channel+{lvl.ffw_type} block      {ms:8.2f} ms "
              f"(x{lvl.num_blocks - 1} cacheless)", flush=True)

        if name in slot_of:
            p_chm = B.attn_block_init(key, spec_chm, dt)
            slot = cache[slot_of[name]]
            ms = timeit(lambda x: B.attn_block_apply(p_chm, x, spec_chm,
                                                     slot)[0], x)
            print(f"  CHM block (full)         {ms:8.2f} ms", flush=True)

            # CHM internals
            chm = p_chm["attn"]
            sabp = chm["spatial_aligner"]
            ln = B._ln_args(p_chm, "norm1")

            ms = timeit(lambda x: B._proj_dw(sabp, ("qk", "qk_dwconv"), x, ln,
                                             spec_chm), x)
            print(f"    sab qk proj            {ms:8.2f} ms", flush=True)
            ms = timeit(lambda x: B._proj_dw(sabp, ("v", "v_dwconv"), x, ln,
                                             spec_chm), x)
            print(f"    sab v proj             {ms:8.2f} ms", flush=True)

            qk = B._proj_dw(sabp, ("qk", "qk_dwconv"), x, ln, spec_chm)
            q_, k_ = jnp.split(qk, 2, axis=-1)

            def q2k2(q_, k_):
                k2 = B._conv(sabp["k2_dwconv"], B._conv(sabp["k2"], k_),
                             stride=ws, padding=1)
                q2 = B._conv(sabp["q2_dwconv"], B._conv(sabp["q2"], q_),
                             stride=ws, padding=1)
                return q2, k2
            ms = timeit(q2k2, q_, k_)
            print(f"    sab q2/k2 strided dw   {ms:8.2f} ms", flush=True)

            q2, k2 = jax.jit(q2k2)(q_, k_)
            hq, wq = q2.shape[1], q2.shape[2]
            hw = hq * wq
            from turtlevsr_tpu.ops.attn_utils import (l2_normalize,
                                                      local_window_mask)
            q = l2_normalize(q2.reshape(1, hw, 2 * c), axis=-1)
            kk = l2_normalize(k2.reshape(1, hw, 2 * c), axis=-1)
            nf = slot["k"].shape[1] + 1
            k_all = jnp.concatenate(
                [slot["k"].astype(dt), kk[:, None]], axis=1)
            ms = timeit(lambda q, k_all: jnp.einsum(
                "bqd,bnkd->bnqk", q, k_all,
                preferred_element_type=jnp.float32), q, k_all)
            print(f"    sab scores einsum      {ms:8.2f} ms "
                  f"(NF={nf}, {hw}x{hw})", flush=True)

            scores = jnp.einsum("bqd,bnkd->bnqk", q, k_all,
                                preferred_element_type=jnp.float32).astype(dt)
            lm = local_window_mask(hq, wq, 4, dt)
            if args.kernels == "pallas":
                from turtlevsr_tpu.kernels.vjp import sab_softmax_op
                ms = timeit(lambda s: sab_softmax_op(
                    s.reshape(nf, hw, hw), lm, False), scores)
            else:
                from turtlevsr_tpu.ops.attn_utils import (clipped_softmax,
                                                          topk_keep)
                ms = timeit(lambda s: clipped_softmax(
                    topk_keep(s, 5) + s * lm[None, None]), scores)
            print(f"    sab sparse softmax     {ms:8.2f} ms", flush=True)

            v_map = B._proj_dw(sabp, ("v", "v_dwconv"), x, ln, spec_chm)
            v = B._lattice_split(v_map, ws)
            v_all = jnp.concatenate([slot["v"].astype(dt), v[:, None]],
                                    axis=1)
            if args.kernels == "pallas":
                a = sab_softmax_op(scores.reshape(nf, hw, hw), lm,
                                   False).reshape(1, nf, hw, hw)
            else:
                a = scores
            ms = timeit(lambda a, v_all: jnp.einsum(
                "bnqk,bnkd->bnqd", a, v_all,
                preferred_element_type=jnp.float32).astype(dt), a, v_all)
            dv = v_all.shape[-1]
            gflop = 2 * nf * hw * hw * dv / 1e9
            print(f"    sab attn@v dense       {ms:8.2f} ms "
                  f"({gflop:.0f} GFLOP, d={dv})", flush=True)

            out_tok = jnp.einsum("bnqk,bnkd->bnqd", a, v_all,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt)
            fvalid = jnp.ones((nf,), bool)
            ms = timeit(lambda t: B._sab_finish(sabp, t, fvalid, ws, h, w),
                        out_tok)
            print(f"    sab finish (merge+po)  {ms:8.2f} ms", flush=True)

            x_sp = B._sab_finish(sabp, out_tok, fvalid, ws, h, w)

            def chm_fhr(x, x_sp):
                xs = x_sp.reshape(nf, h, w, c)
                kv = B._proj_dw(chm, ("kv", "kv_dwconv"), xs, None, spec_chm)
                return kv
            ms = timeit(chm_fhr, x, x_sp)
            print(f"    chm kv proj (NF maps)  {ms:8.2f} ms", flush=True)

            heads = lvl.num_heads
            ctok = c // heads
            l = h * w
            kv = chm_fhr(x, x_sp).reshape(1, nf, l, 2, heads, ctok)
            kh, vh = kv[:, :, :, 0], kv[:, :, :, 1]
            qkv = B._proj_dw(chm["ChanAttn"], ("qkv", "qkv_dwconv"), x, ln,
                             spec_chm)
            ms = timeit(lambda x: B._proj_dw(
                chm["ChanAttn"], ("qkv", "qkv_dwconv"), x, ln, spec_chm), x)
            print(f"    fhr qkv proj           {ms:8.2f} ms", flush=True)
            qkv_r = qkv.reshape(1, l, 3, heads, ctok)
            q3, k3, v3 = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]

            def fhr_grams(q3, k3, kh):
                gh = jnp.einsum("blhc,bnlhd->bhcnd", q3, kh,
                                preferred_element_type=jnp.float32)
                g = jnp.einsum("blhc,blhd->bhcd", q3, k3,
                               preferred_element_type=jnp.float32)
                return gh, g
            ms = timeit(fhr_grams, q3, k3, kh)
            print(f"    fhr gram einsums       {ms:8.2f} ms", flush=True)

            gh, g = fhr_grams(q3, k3, kh)
            a_h = jnp.zeros((1, heads, ctok, nf, ctok), dt)
            a_c = jnp.zeros((1, heads, ctok, ctok), dt)

            def fhr_out(a_h, a_c, vh, v3):
                out = jnp.einsum("bhcnd,bnlhd->blhc", a_h, vh,
                                 preferred_element_type=jnp.float32)
                out = out + jnp.einsum("bhcd,blhd->blhc", a_c, v3,
                                       preferred_element_type=jnp.float32)
                return out.astype(dt)
            ms = timeit(fhr_out, a_h, a_c, vh, v3)
            print(f"    fhr attn@v einsums     {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
