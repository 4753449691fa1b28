"""Analytical HBM-traffic FLOOR for one Turtle frame step, per block type.

Answers the capacity question behind the 30 fps driver target: with PERFECT
kernel fusion (every elementwise/hidden intermediate resident in VMEM, every
map read or written the minimum number of times its dataflow permits), how
few HBM bytes must one 720p frame move — and what fps ceiling does that put
at this chip's measured bandwidth, next to the pure-MXU time?

Floor model (bf16, M = level map bytes = H*W*C*2 / div^2). Assumptions are
deliberately generous to the fused side; the floor is a LOWER bound on
traffic, so the fps it implies is an UPPER bound:

  * FFW/GFFW/NoAttn/ReducedAttn (local ops): read x + write out = 2M. The
    hidden (expansion) maps never exist in HBM.
  * Channel attention (cacheless, c x c Gram over ALL tokens): the gram
    must finish before the apply can start -> two reads of x + one write
    = 3M (the live fused stats+FFN block is measured at ~4-5M).
  * FHR (cached Gram attention, turtle_arch.py:220-288): 3M for the
    gram/apply pattern + reading the nf cached k/v history maps (2*nf*M)
    + writing this frame's k/v into the ring (2M).
  * CHM (turtle_arch.py:535-585, SAB + kv embed + FHR tail): read x (1M),
    read the nf cached v-token maps for SAB's @v (nf*M), write the
    aligned/merged output + this frame's cache update (2M), write out
    (1M) -> (nf+4)*M. Assumes the kv embeddings and x_sp aligned maps are
    CONSUMED in VMEM by the gram accumulation (the fused chm-stats kernel
    already does this for the grams) — strictly a floor.
  * SAB standalone (t0 attn_type2): like CHM without the FHR tail:
    (nf+3)*M.
  * Level glue per level transition: downsample/upsample read+write,
    skip-concat 1x1 reduce reads both inputs + writes = counted once per
    transition at the finer level's M.
  * Cache ring maintenance beyond the counted reads/writes is free
    (in-place donation, true at HEAD).

Usage: python tools/roofline.py [--opt options/Turtle_Deblur_Gopro.yml]
                                [--size 720 1280] [--json out.json]

Chip constants are the MEASURED numbers from CLAUDE.md (v5e via axon):
bf16 matmul ~137 TF/s peak / ~93 TF/s whole-model mix, HBM ~326 GB/s.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HBM_GBPS = 326.0      # measured effective HBM bandwidth
MXU_TFLOPS = 137.0    # measured large-matmul bf16 peak
MXU_MIX_TFLOPS = 93.0  # measured whole-model mix
FLOPS_720P_T1 = 3.41e12  # XLA cost analysis, t1 720p frame (BENCH r2)


def _floor_traversals(attn_type: str, nf: int) -> float:
    """Floor map-traversal count for one block of the given attention type
    (attention + its FFN half, perfectly fused)."""
    if attn_type in ("NoAttn", "ReducedAttn"):
        return 2.0
    if attn_type == "Channel":
        return 3.0
    if attn_type == "FHR":
        return 3.0 + 2.0 * nf + 2.0
    if attn_type == "CHM":
        return float(nf + 4)
    if attn_type == "SAB":
        return float(nf + 3)
    raise ValueError(attn_type)


def roofline(opt_path: str, h0: int, w0: int):
    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.models.turtle import padded_hw

    opt = load_options(opt_path, is_train=False)
    cfg = model_config_from_options(opt)
    hp, wp = padded_hw(cfg, h0, w0)

    levels = [("enc1", cfg.enc1, 1), ("enc2", cfg.enc2, 2),
              ("enc3", cfg.enc3, 4), ("latent", cfg.latent, 8),
              ("dec3", cfg.dec3, 4), ("dec2", cfg.dec2, 2),
              ("dec1", cfg.dec1, 1), ("refinement", cfg.refinement, 1)]

    rows = []
    total_bytes = 0.0
    for name, lvl, div in levels:
        m = (hp // div) * (wp // div) * lvl.dim * 2  # bf16 map bytes
        nf = lvl.num_frames_tocache
        # block i < n-1 uses attn_type1, block n-1 uses attn_type2;
        # the latent level: [attn_type1, attn_type2 x (n-2), attn_type3]
        types = ([lvl.attn_type1] + [lvl.attn_type2] * (lvl.num_blocks - 2)
                 + [lvl.attn_type3]) if lvl.attn_type3 else \
            ([lvl.attn_type1] * (lvl.num_blocks - 1) + [lvl.attn_type2])
        trav = sum(_floor_traversals(t, nf) for t in types)
        b = trav * m
        rows.append({"level": name, "map_mb": round(m / 1e6, 1),
                     "blocks": lvl.num_blocks, "types": types,
                     "floor_traversals": trav,
                     "floor_gb": round(b / 1e9, 3)})
        total_bytes += b

    # level-transition glue: down/up resample (read+write at the finer M)
    # and the two skip concat+reduce 1x1s (read skip + read up + write)
    glue = 0.0
    for _, lvl, div in levels[:3]:  # down1_2, down2_3, down3_4 read side
        glue += 2.0 * (hp // div) * (wp // div) * lvl.dim * 2
    for _, lvl, div in [levels[4], levels[5], levels[6]]:  # up+concat+reduce
        glue += 3.0 * (hp // div) * (wp // div) * lvl.dim * 2
    total_bytes += glue

    traffic_ms = total_bytes / (HBM_GBPS * 1e6)
    mxu_ms_peak = FLOPS_720P_T1 / (MXU_TFLOPS * 1e9)
    mxu_ms_mix = FLOPS_720P_T1 / (MXU_MIX_TFLOPS * 1e9)
    # compute and HBM overlap on TPU: the frame floor is the max of the two
    frame_ms_peak = max(traffic_ms, mxu_ms_peak)
    frame_ms_mix = max(traffic_ms, mxu_ms_mix)

    out = {
        "opt": os.path.basename(opt_path),
        "size": [h0, w0], "padded": [hp, wp],
        "per_level": rows,
        "glue_gb": round(glue / 1e9, 3),
        "floor_traffic_gb": round(total_bytes / 1e9, 2),
        "floor_traffic_ms": round(traffic_ms, 1),
        "mxu_ms_at_peak_137tf": round(mxu_ms_peak, 1),
        "mxu_ms_at_mix_93tf": round(mxu_ms_mix, 1),
        "ceiling_fps_mxu_peak": round(1000.0 / frame_ms_peak, 1),
        "ceiling_fps_mxu_mix": round(1000.0 / frame_ms_mix, 1),
        "note": "floor = perfect fusion lower bound on HBM bytes; fps "
                "numbers are therefore upper bounds. Compare "
                "floor_traffic_gb with the measured TRAFFIC_r*.json "
                "hbm_gb to see the remaining fusion headroom.",
    }
    # ---- v2 (r5): the HBM/MXU roofline above assumes NEAR-PERFECT
    # cross-block fusion and zero vector-unit cost. Round 4 MEASURED both
    # fusion instruments slower than the split pipelined kernels
    # (VMEM-resident level megakernel: latent 9.55 vs 8.13 ms, enc3 16.54
    # vs 13.46; two-dw-stage chain: enc1 pair 24.3 vs 18.4, refine 19.9
    # vs 12.9 — kernels/level.py, kernels/chain2.py, both shipped opt-in
    # with tests), so the split-kernel decomposition is structurally
    # fixed and the model is VPU-bound, not bandwidth-bound. The binding
    # bound is the per-site structural VPU+MXU cost of the fused kernels
    # (tools/vpu_ledger.py, rates measured on chip by tools/vpu_probe.py).
    v2 = {
        "anti_fusion_measurements": {
            "level_megakernel_ms": {"latent": [9.55, 8.13],
                                    "enc3": [16.54, 13.46]},
            "two_stage_chain_ms": {"enc1_pair": [24.3, 18.4],
                                   "refine": [19.9, 12.9]},
            "meaning": "[fused, split] — the fusion the 27-40 fps "
                       "ceiling assumed is MEASURED SLOWER on this chip "
                       "(Mosaic's cross-strip DMA/compute pipelining is "
                       "worth more than the HBM round trips it saves)",
        },
    }
    if os.path.exists("VPU_LEDGER.json"):
        with open("VPU_LEDGER.json") as fh:
            led = json.load(fh)
        vpu_ms = led.get("total_structural_ms")
        meas_ms = led.get("total_measured_ms")
        v2["vpu_structural_ms"] = vpu_ms         # upper bound on the
        # in-kernel arithmetic's cost at probe rates (sites measure AT or
        # BELOW it -> no scheduling headroom left inside the kernels)
        if meas_ms:
            v2["vpu_measured_ms"] = meas_ms
        v2["binding_bound"] = "vpu (in-kernel vector arithmetic)"
    # execution-tuning asymptote: the pallas sites already run at/below
    # their structural arithmetic cost (VPU_LEDGER ratios <= 1 except
    # chm's ~1.3 sequential-fill loss); the XLA remainder is saturated
    # (dense @v 176 TF/s, formatting ~500-600 GB/s, PROFILE_r05). The
    # recoverable slack is ~10-25 ms of the ~164 ms device frame ->
    v2["execution_tuning_asymptote_fps"] = [6.5, 7.5]
    v2["statement"] = (
        "single-chip v5e asymptote for this architecture is ~6.5-7.5 fps "
        "at 720p by execution tuning alone; reaching 8-10 needs the "
        "remaining VPU work removed algorithmically (attention sparsity "
        "on real-video weights, cheaper activation, smaller model), and "
        "the 30 fps driver target is NOT reachable on one v5e for this "
        "architecture — the 27-40 fps v1 numbers above are HBM/MXU-only "
        "bounds whose perfect-fusion assumption round 4 measured out "
        "(anti_fusion_measurements)")
    out["v2"] = v2
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", default="options/Turtle_Deblur_Gopro.yml")
    ap.add_argument("--size", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    r = roofline(args.opt, *args.size)
    for row in r["per_level"]:
        kinds = "/".join(sorted(set(row["types"])))
        print(f"{row['level']:<11} map {row['map_mb']:>7.1f} MB x "
              f"{row['blocks']:>2} blocks  floor "
              f"{row['floor_traversals']:>5.1f} traversals = "
              f"{row['floor_gb']:>6.2f} GB   ({kinds})")
    print(f"glue (resample/skip-concat)                          "
          f"= {r['glue_gb']:>6.2f} GB")
    print(f"FLOOR traffic {r['floor_traffic_gb']} GB/frame -> "
          f"{r['floor_traffic_ms']} ms at {HBM_GBPS:.0f} GB/s")
    print(f"MXU {FLOPS_720P_T1/1e12:.2f} TFLOP -> {r['mxu_ms_at_peak_137tf']}"
          f" ms at peak / {r['mxu_ms_at_mix_93tf']} ms at whole-model mix")
    print(f"CEILING: {r['ceiling_fps_mxu_peak']} fps (peak MXU) / "
          f"{r['ceiling_fps_mxu_mix']} fps (measured mix)")
    for f in ("TRAFFIC_r04.json", "TRAFFIC_r03.json", "TRAFFIC_r02.json"):
        if os.path.exists(f):
            with open(f) as fh:
                t = json.load(fh)
            print(f"measured ({f}): {t.get('hbm_gb')} GB/frame -> "
                  f"{t.get('hbm_gb', 0) / r['floor_traffic_gb']:.1f}x the "
                  "floor")
            break
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(r, fh, indent=1)


if __name__ == "__main__":
    main()
