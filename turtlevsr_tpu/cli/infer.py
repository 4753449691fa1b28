"""Inference / evaluation CLI — the basicsr/inference.py and
inference_no_ground_truth.py equivalents.

With ground truth (per-video PSNR/SSIM, eval-script metric variants):

    python -m turtlevsr_tpu.cli.infer -opt options/Turtle_Deblur_Gopro.yml \\
        --model_path ckpt_dir_or_pth --data_dir /data/GoPro/test/blur \\
        --tile 320 --tile_overlap 128 --save_path results/

Without ground truth (arbitrary frame folders, FPS report):

    python -m turtlevsr_tpu.cli.infer ... --no_gt

Protocol notes (mirroring inference.py:260-370):
  * frames stream per video in sorted order, causal history threaded,
  * --tile enables the reference's sliding-window protocol (per-tile
    caches); omit for whole-frame (fits on a 16 GB chip in bf16),
  * denoising: gaussian noise sigma=--noise_sigma/255 is synthesised on the
    GT frames (fixed seed per video, inference.py:115-124),
  * SR inputs are bicubic-downsampled x4 before the model,
  * metrics use the eval-script implementations (255-range PSNR,
    scipy-gaussian SSIM; optional Y-channel) — NOT the val-loop variants.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from statistics import mean

import numpy as np


# per-task eval presets mirroring the reference's __main__ blocks
# (inference.py:483-639): option file, tiling, metric flavour, noise
TASK_PRESETS = {
    "deblur": dict(opt="options/Turtle_Deblur_Gopro.yml", tile=320,
                   tile_overlap=192),
    "denoise": dict(opt="options/Turtle_Denoise_Davis.yml", tile=320,
                    tile_overlap=128, noise_sigma=50.0),
    "derain": dict(opt="options/Turtle_Derain.yml", tile=320,
                   tile_overlap=128, y_channel=True),
    "raindrop": dict(opt="options/Turtle_Derain_VRDS.yml", tile=320,
                     tile_overlap=128),
    "desnow": dict(opt="options/Turtle_Desnow.yml", tile=320,
                   tile_overlap=128),
    "sr": dict(opt="options/Turtle_SR_MVSR.yml", tile=256, tile_overlap=64),
}


def stable_video_seed(seed: int, video_name: str) -> int:
    """Deterministic per-video noise seed (stable across runs/processes —
    unlike the reference, which relies on the first run's unseeded .npy
    files persisting on disk, inference.py:115-124)."""
    import zlib

    return (seed * 1000003 + zlib.crc32(video_name.encode())) % (2 ** 31)


def prepare_noisy_frames(frames, video_name: str, noise_sigma: float,
                         noisy_root: str, dataset_name: str = "Set8",
                         seed: int = 0):
    """The reference Denoising protocol (inference.py:88-141): per-video
    noisy frames are PRE-SAMPLED to .npy files once and reloaded by every
    later run, so scores are comparable across runs at the 0.05 dB bar.
    Noise is gaussian sigma/255 per frame on the [0,1] GT. Returns the list
    of noisy-frame .npy paths (sorted)."""
    # seed 0 keeps the reference's on-disk layout ({video}_{sigma},
    # inference.py:115-124); a non-default seed gets its own folder so
    # changing --seed is never silently ignored by a stale cache
    suffix = "" if seed == 0 else f"_s{seed}"
    folder = os.path.join(noisy_root, dataset_name,
                          f"{video_name}_{int(noise_sigma)}{suffix}")
    os.makedirs(folder, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(folder, "*.npy")))
    if len(existing) == len(frames):
        print(f"reusing pre-sampled noisy frames in {folder}")
        return existing
    rng = np.random.RandomState(stable_video_seed(seed, video_name))
    paths = []
    for i, frame in enumerate(frames):
        noisy = frame + rng.normal(0.0, noise_sigma / 255.0,
                                   frame.shape).astype(np.float32)
        path = os.path.join(folder, f"{i:08d}.npy")
        np.save(path, noisy.astype(np.float32))
        paths.append(path)
    return paths


def save_eval_artifacts(save_path: str, model_name: str, video_name: str,
                        ix: int, inp_u8, pred_u8, gt_u8, psnr: float,
                        ssim: float) -> None:
    """Reference output layout (inference.py:329-363): per-frame
    Frame_{ix+1}_Input/Pred/GT.png plus a matplotlib triptych
    Frame_{ix+1}.png under {save_path}/{model_name}/{video_name}."""
    from turtlevsr_tpu.utils.img import imwrite

    base = os.path.join(save_path, model_name, video_name)
    os.makedirs(base, exist_ok=True)
    imwrite(pred_u8, os.path.join(base, f"Frame_{ix + 1}_Pred.png"))
    imwrite(inp_u8, os.path.join(base, f"Frame_{ix + 1}_Input.png"))
    imwrite(gt_u8, os.path.join(base, f"Frame_{ix + 1}_GT.png"))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # triptych is optional; PNGs above always written
        return
    fig, axs = plt.subplots(1, 3, figsize=(10, 10))
    axs[0].imshow(inp_u8)
    axs[1].imshow(pred_u8)
    axs[2].imshow(gt_u8)
    axs[0].set_title("Input")
    axs[1].set_title(f"Pred {psnr:.2f}/{ssim:.2f}")
    axs[2].set_title(f"GT Frame {ix}")
    plt.tight_layout()
    fig.savefig(os.path.join(base, f"Frame_{ix + 1}.png"),
                bbox_inches="tight")
    plt.close(fig)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=sorted(TASK_PRESETS),
                   help="fill option-file/tile/metric defaults for a task")
    p.add_argument("-opt", "--opt", default=None)
    p.add_argument("--model_path", default=None,
                   help=".pth (reference) or orbax params dir; random init "
                        "if omitted (smoke testing)")
    p.add_argument("--data_dir", required=True,
                   help="folder of video folders (the LQ/blur side)")
    p.add_argument("--gt_dir", default=None,
                   help="GT folder; defaults to data_dir with 'blur'->'gt'")
    p.add_argument("--save_path", default=None)
    p.add_argument("--tile", type=int, default=0,
                   help="tile size (0 = whole frame)")
    p.add_argument("--tile_overlap", type=int, default=128)
    p.add_argument("--no_gt", action="store_true")
    p.add_argument("--y_channel", action="store_true")
    p.add_argument("--noise_sigma", type=float, default=None,
                   help="denoising: synthesize noisy inputs at sigma/255")
    p.add_argument("--noisy_dir", default=None,
                   help="root for pre-sampled noisy .npy frames (default: "
                        "<save_path or .>/noisy_data); reused when present")
    p.add_argument("--dataset_name", default="Set8",
                   help="dataset label for the noisy-frame folder layout")
    p.add_argument("--model_name", default="model",
                   help="subfolder name for saved eval artifacts")
    p.add_argument("--seed", type=int, default=0,
                   help="base seed for the per-video noise sampling")
    p.add_argument("--kernels", choices=["xla", "pallas"], default="pallas")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--max_frames", type=int, default=0)
    args = p.parse_args()
    if args.task:
        preset = TASK_PRESETS[args.task]
        if args.opt is None:
            args.opt = preset["opt"]
        if args.tile == 0 and "--tile" not in " ".join(sys.argv):
            args.tile = preset.get("tile", 0)
            args.tile_overlap = preset.get("tile_overlap", args.tile_overlap)
        if args.noise_sigma is None:
            args.noise_sigma = preset.get("noise_sigma")
        args.y_channel = args.y_channel or preset.get("y_channel", False)
    if args.opt is None:
        p.error("either --task or -opt is required")
    return args


def main():
    from turtlevsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.data.loader import prefetch_iter
    from turtlevsr_tpu.eval.engine import InferenceEngine, VideoFrames
    from turtlevsr_tpu.io.checkpoint import restore_params
    from turtlevsr_tpu.metrics import bgr2ycbcr, psnr_255, ssim_gaussian
    from turtlevsr_tpu.models.turtle import init_params
    from turtlevsr_tpu.utils.img import img_from_float, imwrite

    opt = load_options(args.opt, is_train=False)
    opt["kernels"] = args.kernels
    cfg = model_config_from_options(opt)

    if args.model_path:
        params = restore_params(args.model_path)
        print(f"> Loaded Model. ({args.model_path})")
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
        print("> WARNING: random init (no --model_path)")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    engine = InferenceEngine(
        cfg, params, mode="tiled" if args.tile else "whole",
        tile=args.tile, tile_overlap=args.tile_overlap, dtype=dtype)

    videos = sorted(d for d in glob.glob(os.path.join(args.data_dir, "*"))
                    if os.path.isdir(d))
    if not videos:
        raise FileNotFoundError(f"no video folders under {args.data_dir}")

    all_psnr, all_ssim = [], []
    total_frames, total_time, device_time = 0, 0.0, 0.0
    for vdir in videos:
        vname = os.path.basename(vdir)
        frames = VideoFrames(vdir)
        gt_frames = None
        if not args.no_gt and args.noise_sigma is None:
            gt_dir = args.gt_dir or args.data_dir.replace("blur", "gt")
            gt_frames = VideoFrames(os.path.join(gt_dir, vname))
        print(f"> # of Frames in {vname}: {len(frames)}")

        noisy_paths = None
        if args.noise_sigma is not None:
            noisy_root = args.noisy_dir or os.path.join(
                args.save_path or ".", "noisy_data")
            noisy_paths = prepare_noisy_frames(
                list(frames), vname, args.noise_sigma, noisy_root,
                dataset_name=args.dataset_name, seed=args.seed)
        engine.reset()
        v_psnr, v_ssim = [], []
        gt_iter = prefetch_iter(gt_frames) if gt_frames else None

        def postprocess(ix, frame, gt, out):
            # runs on the single postprocess worker (in submission order)
            # while the device computes the NEXT frame; `out` is already
            # a host array (fetched on the main loop thread)
            out_u8 = img_from_float(out)
            ps = ss = float("nan")
            if gt is not None and not args.no_gt:
                gt_u8 = img_from_float(gt)
                if args.y_channel:
                    a = bgr2ycbcr(out_u8[:, :, ::-1])
                    b_ = bgr2ycbcr(gt_u8[:, :, ::-1])
                else:
                    a, b_ = out_u8, gt_u8
                ps = psnr_255(a, b_)
                ss = ssim_gaussian(a, b_)
                v_psnr.append(ps)
                v_ssim.append(ss)
                print(f"PSNR for Frame: {ix} -- {ps}")

            if args.save_path:
                if gt is not None and not args.no_gt:
                    save_eval_artifacts(
                        args.save_path, args.model_name, vname, ix,
                        img_from_float(np.clip(frame, 0.0, 1.0)), out_u8,
                        img_from_float(gt), ps, ss)
                else:
                    imwrite(out_u8, os.path.join(args.save_path, vname,
                                                 f"Frame_{ix + 1}_Pred.png"))

        # 1-worker pipeline: frame decode rides the prefetch thread, the
        # device runs one frame ahead of the main-thread output fetch, and
        # metrics + PNG writes ride the postprocess worker. The fetch stays
        # on the MAIN thread so the device-loop clock (dispatch->fetch) is
        # not distorted by slow postprocess (matplotlib/PNG on one core);
        # "FPS:" below is end-to-end wall, the reference's semantics
        # (inference_no_ground_truth.py:195,288-291 times its whole loop
        # including saving).
        t_loop = time.perf_counter()
        n_vid = 0
        futs = deque()
        pending = None  # (ix, frame, gt, out_dev) awaiting its fetch
        frame_iter = prefetch_iter(frames)
        try:
            with ThreadPoolExecutor(1) as post:
                for ix, frame in enumerate(frame_iter):
                    if args.max_frames and ix >= args.max_frames:
                        break
                    gt = next(gt_iter) if gt_iter else None
                    if noisy_paths is not None:
                        gt = frame
                        frame = np.load(noisy_paths[ix]).astype(np.float32)
                    out_dev = engine.step_async(frame)
                    if pending is not None:
                        p_ix, p_frame, p_gt, p_dev = pending
                        out = np.asarray(p_dev, np.float32)
                        futs.append(post.submit(
                            postprocess, p_ix, p_frame, p_gt, out))
                        while len(futs) > 2:
                            futs.popleft().result()
                    pending = (ix, frame, gt, out_dev)
                    n_vid += 1
                if pending is not None:
                    p_ix, p_frame, p_gt, p_dev = pending
                    out = np.asarray(p_dev, np.float32)
                    futs.append(post.submit(
                        postprocess, p_ix, p_frame, p_gt, out))
                device_time += time.perf_counter() - t_loop
                while futs:
                    futs.popleft().result()
        finally:
            # stop the prefetch producers promptly (an early --max_frames
            # break would otherwise leave them spinning until GC)
            frame_iter.close()
            if gt_iter is not None:
                gt_iter.close()
        total_time += time.perf_counter() - t_loop
        total_frames += n_vid

        if v_psnr:
            print(f"PSNR for {vname}: {mean(v_psnr)}")
            print(f"SSIM for {vname} is {mean(v_ssim)}")
            all_psnr += v_psnr
            all_ssim += v_ssim

    if total_frames:
        print(f"FPS: {total_frames / total_time:.3f} "
              f"({total_frames} frames in {total_time:.1f}s)")
        if device_time > 0:
            # decode+compute only (clock stops at the last output fetch,
            # before the postprocess futures drain) — comparable with the
            # model-only FPS earlier revisions of this CLI printed
            print(f"Device-loop FPS: {total_frames / device_time:.3f}")
    if all_psnr:
        print(f"Overall PSNR: {mean(all_psnr)}")
        print(f"Overall SSIM: {mean(all_ssim)}")


if __name__ == "__main__":
    main()
