"""Kernel-gate report: which Pallas fast paths fire at a given config+shape.

For every level of the model, evaluates every kernel shape/bias gate the
forward would consult and prints PALLAS/XLA per site with the failing
predicate when a site falls back. Pure shape arithmetic — no device, no
compile — so it runs anywhere and explains bench-suite anomalies
(VERDICT r3 weak #2: desnow-t0 / 1080p readings) without chip time.

Usage: python tools/gate_report.py [H W] [--opt options/Turtle_Desnow.yml]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", nargs="*", type=int, default=[720, 1280])
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    args = ap.parse_args()
    h0, w0 = (args.size + [720, 1280])[:2]

    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.models import turtle as T
    from turtlevsr_tpu.kernels import ffn as F
    from turtlevsr_tpu.kernels.sab import sab_sparse_softmax_supported
    from turtlevsr_tpu.kernels.lattice import lattice_supported

    opt = load_options(args.opt, is_train=False)
    cfg = model_config_from_options(opt)
    cfg = dataclasses.replace(cfg, kernels="pallas")
    hp, wp = T.padded_hw(cfg, h0, w0)
    print(f"config={args.opt} variant={cfg.variant} input {h0}x{w0} "
          f"-> padded {hp}x{wp}")

    exp = cfg.ffn_expansion_factor
    bias = cfg.bias

    def line(lvl_name, site, ok, why=""):
        tag = "PALLAS" if ok else "XLA   "
        print(f"  {lvl_name:6s} {tag} {site}" + (f"  [{why}]" if why else ""))

    levels = [("enc1", cfg.enc1, 1), ("enc2", cfg.enc2, 2),
              ("enc3", cfg.enc3, 4), ("latent", cfg.latent, 8),
              ("dec3", cfg.dec3, 4), ("dec2", cfg.dec2, 2),
              ("dec1", cfg.dec1, 1), ("refine", cfg.refinement, 1)]
    for name, lvl, div in levels:
        h, w, c = hp // div, wp // div, lvl.dim
        nf = lvl.num_frames_tocache + 1
        ws = 2 * lvl.scale_patchsize
        types = {lvl.attn_type1, lvl.attn_type2}
        if getattr(lvl, "attn_type3", None):
            types.add(lvl.attn_type3)
        print(f"{name}: {h}x{w}x{c} blocks={lvl.num_blocks} "
              f"attn={sorted(types)} ffw={lvl.ffw_type} ws={ws}")
        hid = int(c * exp)  # GFFW per-gate-half width == hid
        if "ReducedAttn" in types:
            dw = 2 * c
            ok = F.ffn_pallas_supported(h, w, c, dw, True)
            line(name, "ReducedAttn half", ok,
                 "" if ok else f"no strip h={h} w%8={w % 8}")
            if lvl.ffw_type == "FFW":
                ok2 = F.block2_supported(h, w, c, dw, 2 * c)
                line(name, "chained RA+FFW block", ok2,
                     "" if ok2 else "strip/chan-major")
        if lvl.ffw_type == "GFFW":
            for np_ in ({0, nf + 1 if "CHM" in types else 1}
                        if types - {"ReducedAttn", "NoAttn"} else {0}):
                ok = F.ffn_pallas_supported(h, w, c, hid, True, has_pair=np_)
                line(name, f"GFFW half (pairs={np_})", ok,
                     "" if ok else f"no strip (e={hid})")
        else:
            ok = F.ffn_pallas_supported(h, w, c, 2 * c, False)
            line(name, "FFW half", ok, "" if ok else "row block")
        if "Channel" in types or "FHR" in types or "CHM" in types:
            ok = F.qkv_stats_supported(h, w, c)
            line(name, "qkv-stats kernel", ok,
                 "" if ok else f"no strip (w%8={w % 8})")
        if "CHM" in types:
            ok = F.chm_stats_supported(h, w, c, nf) and not bias
            line(name, f"chm-stats kernel (nf={nf})", ok,
                 "" if ok else ("bias" if bias else "no strip"))
            ok = F.ffn_pallas_supported(h, w, c, hid, True, has_pair=nf + 1)
            line(name, f"CHM-apply-in-FFN (pairs={nf + 1})", ok,
                 "" if ok else "no strip w/ pair streams")
            hw = (h // ws) * (w // ws)
            ok = sab_sparse_softmax_supported(hw, hw)
            line(name, f"SAB fused softmax (hw={hw})", ok)
            ok = lattice_supported(h, w, c, ws)
            line(name, f"lattice split/merge (c={c})", ok,
                 "" if ok else "c<128 copy grain")
            ok = F.conv3x3_pallas_supported(h, w, c, c)
            line(name, "SAB v+po composite conv3", ok)
            est = 2 * (hw * hw * nf * 2) / 1e9
            print(f"         note: SAB scores/@v are O(hw^2): "
                  f"{hw}^2 x {nf} frames ~ {est:.2f} GB/frame bf16 traffic "
                  f"in probs alone")
        cm = F._chan_major_ok(hid, w, False)
        print(f"         chan-major GFFW hidden: "
              f"{'ON' if cm and lvl.ffw_type == 'GFFW' else 'off'} "
              f"(e={hid}, w%128={w % 128})"
              + (" [roll taps]" if cm and w % 128 else ""))
        print(f"         transposed (sublane) LN: "
              f"{'ON' if F._ln_t_ok(w) else 'off (w%128!=0)'}")

    # U-Net glue convs
    d1, d2, d3, d4 = cfg.level_dims
    for nm, (h, w, ci, co) in {
            "input_proj": (hp, wp, cfg.inp_channels
                           * (2 if cfg.use_both_input else 1), d1),
            "down1_2": (hp, wp, d1, d1 // 2),
            "down2_3": (hp // 2, wp // 2, d2, d2 // 2),
            "down3_4": (hp // 4, wp // 4, d3, d3 // 2),
            "up4_3": (hp // 8, wp // 8, d4, 2 * d4),
            "up3_2": (hp // 4, wp // 4, d3, 2 * d3),
            "up2_1": (hp // 2, wp // 2, d2, 2 * d2),
            "ending": (hp, wp, d1, cfg.out_channels)}.items():
        ok = F.conv3x3_pallas_supported(h, w, ci, co)
        line("glue", f"{nm} conv3x3 {ci}->{co} @{h}x{w}", ok)


if __name__ == "__main__":
    main()
