"""Gradio web UI — the app.py equivalent (task registry, video/image
restoration, side-by-side and wipe comparison outputs, cancellable jobs).

Requires ``gradio`` (optional; not bundled in minimal images):

    python -m turtlevsr_tpu.app --ckpt-dir checkpoints/

Feature parity with the reference (app.py:1-1029): video + image
restoration tabs, result/wipe/side-by-side/slider comparison outputs
(:93-384), custom checkpoint/config override (:493-500). Differences by
design: jobs run in daemon threads with a cooperative ``threading.Event``
cancel checked between frames — instead of injecting SystemExit into
threads via ctypes (app.py:66-87) — and the per-task registry maps to
local checkpoint paths supplied at launch instead of hard-coded ones.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import threading
import time

import numpy as np

# task -> (option file, model variant); checkpoints resolve under --ckpt-dir
SUPPORTED_TASKS = {
    "Video Deblurring (GoPro)": ("Turtle_Deblur_Gopro.yml", "GoPro_Deblur"),
    "Video Deraining (NightRain)": ("Turtle_Derain.yml", "NightRain"),
    "Rain Drop Removal (VRDS)": ("Turtle_Derain_VRDS.yml", "RainDrop"),
    "Video Desnowing (RSVD)": ("Turtle_Desnow.yml", "Desnow"),
    "Video Denoising (DAVIS/Set8)": ("Turtle_Denoise_Davis.yml", "Denoise"),
    "Video Super-Resolution x4 (MVSR)": ("Turtle_SR_MVSR.yml", "SR"),
}

MAX_DIM = 3840  # 4K guard (app.py:413)


class Job:
    def __init__(self):
        self.cancel = threading.Event()
        self.progress = 0.0


def _build_task_model(task: str, ckpt_dir: str, options_dir: str,
                      custom_model_path: str = "",
                      custom_config_path: str = ""):
    """Resolve (cfg, params) for a task, honouring a custom checkpoint /
    option-file override (app.py:493-500)."""
    import jax

    from turtlevsr_tpu.config.options import (load_options,
                                              model_config_from_options)
    from turtlevsr_tpu.io.checkpoint import restore_params
    from turtlevsr_tpu.models.turtle import init_params

    yml, ckpt_name = SUPPORTED_TASKS[task]
    yml_path = custom_config_path or os.path.join(options_dir, yml)
    opt = load_options(yml_path, is_train=False)
    opt["kernels"] = "pallas"
    cfg = model_config_from_options(opt)

    ckpt = custom_model_path or None
    if not ckpt:
        for cand in (os.path.join(ckpt_dir, ckpt_name),
                     os.path.join(ckpt_dir, ckpt_name + ".pth")):
            if os.path.exists(cand):
                ckpt = cand
                break
    if ckpt:
        params = restore_params(ckpt)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def restore_video(video_path: str, task: str, ckpt_dir: str,
                  options_dir: str, tile: int = 0, max_frames: int = 0,
                  job: Job | None = None, progress_cb=None,
                  custom_model_path: str = "",
                  custom_config_path: str = "") -> dict:
    """Extract frames -> stream restore -> assemble result + comparisons
    (plain, side-by-side, wipe and slider videos, app.py:93-384)."""
    from turtlevsr_tpu.eval.engine import InferenceEngine
    from turtlevsr_tpu.utils.img import float_from_img, img_from_float, imwrite
    from turtlevsr_tpu.utils.video_io import (
        comparison_slider_video, comparison_wipe_video, extract_frames,
        frames_to_video, side_by_side_video)

    job = job or Job()
    cfg, params = _build_task_model(task, ckpt_dir, options_dir,
                                    custom_model_path, custom_config_path)

    work = tempfile.mkdtemp(prefix="turtle_app_")
    frames_dir = os.path.join(work, "frames")
    out_dir = os.path.join(work, "restored")
    os.makedirs(out_dir, exist_ok=True)
    n = extract_frames(video_path, frames_dir)
    if max_frames:
        n = min(n, max_frames)

    from PIL import Image

    files = sorted(os.listdir(frames_dir))[:n]
    first = Image.open(os.path.join(frames_dir, files[0]))
    if max(first.size) > MAX_DIM:
        raise ValueError(f"video exceeds {MAX_DIM}px limit")

    engine = InferenceEngine(cfg, params,
                             mode="tiled" if tile else "whole", tile=tile)
    # one-frame-lag pipeline (same shape as cli/infer.py): dispatch frame i
    # before fetching frame i-1's output, so PNG decode/encode on the host
    # overlaps the device compute; a 1-thread executor keeps writes ordered
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    pending = None  # (index, filename, device output) awaiting its fetch
    futs = deque()

    def write_out(fname, out_np, i):
        imwrite(img_from_float(out_np), os.path.join(out_dir, fname))
        job.progress = 0.3 + 0.5 * (i + 1) / len(files)
        if progress_cb:
            progress_cb(job.progress)

    with ThreadPoolExecutor(1) as post:
        for i, f in enumerate(files):
            if job.cancel.is_set():
                return {"status": "cancelled"}
            img = float_from_img(np.asarray(
                Image.open(os.path.join(frames_dir, f)).convert("RGB")))
            out_dev = engine.step_async(img)
            if pending is not None:
                p_i, p_f, p_dev = pending
                out = np.asarray(p_dev, np.float32)  # device sync on main thread
                futs.append(post.submit(write_out, p_f, out, p_i))
                while len(futs) > 2:
                    futs.popleft().result()
            pending = (i, f, out_dev)
        if pending is not None:
            p_i, p_f, p_dev = pending
            futs.append(post.submit(write_out, p_f,
                                    np.asarray(p_dev, np.float32), p_i))
        while futs:
            futs.popleft().result()
    fps = len(files) / (time.time() - t0)

    result = os.path.join(work, "restored.mp4")
    frames_to_video(out_dir, result)
    wipe = os.path.join(work, "comparison.mp4")
    comparison_wipe_video(frames_dir, out_dir, wipe)
    sbs = os.path.join(work, "side_by_side.mp4")
    side_by_side_video(frames_dir, out_dir, sbs)
    slider = os.path.join(work, "slider.mp4")
    comparison_slider_video(frames_dir, out_dir, slider)
    return {"status": "ok", "video": result, "comparison": wipe,
            "side_by_side": sbs, "slider": slider, "fps": fps}


def restore_image(image_path: str, task: str, ckpt_dir: str,
                  options_dir: str, tile: int = 0,
                  custom_model_path: str = "",
                  custom_config_path: str = "") -> dict:
    """Single-image restoration (the reference's image tab,
    app.py:667-811): the image streams through the same engine as a
    one-frame video; returns result + side-by-side comparison paths."""
    import numpy as np
    from PIL import Image

    from turtlevsr_tpu.eval.engine import InferenceEngine
    from turtlevsr_tpu.utils.img import float_from_img, img_from_float, imwrite

    img = Image.open(image_path).convert("RGB")
    if max(img.size) > MAX_DIM:
        raise ValueError(f"image exceeds {MAX_DIM}px limit")
    cfg, params = _build_task_model(task, ckpt_dir, options_dir,
                                    custom_model_path, custom_config_path)
    engine = InferenceEngine(cfg, params,
                             mode="tiled" if tile else "whole", tile=tile)
    x = float_from_img(np.asarray(img))
    out = engine.step(x)
    work = tempfile.mkdtemp(prefix="turtle_img_")
    out_path = os.path.join(work, "restored.png")
    imwrite(img_from_float(out), out_path)
    inp8 = np.asarray(img)
    out8 = img_from_float(out)
    if out8.shape[:2] != inp8.shape[:2]:  # SR: upscale input for comparison
        inp8 = np.asarray(img.resize((out8.shape[1], out8.shape[0])))
    sbs_path = os.path.join(work, "side_by_side.png")
    imwrite(np.hstack((inp8, out8)), sbs_path)
    return {"status": "ok", "image": out_path, "side_by_side": sbs_path}


def create_ui(ckpt_dir: str, options_dir: str):
    import gradio as gr

    jobs: dict = {}

    def process(video, task, tile, use_custom, custom_ckpt, custom_yml):
        job = Job()
        jobs[id(job)] = job
        try:
            res = restore_video(
                video, task, ckpt_dir, options_dir,
                tile=int(tile) if tile else 0, job=job,
                custom_model_path=custom_ckpt if use_custom else "",
                custom_config_path=custom_yml if use_custom else "")
        except Exception as e:  # surface errors in the UI
            return None, None, None, None, f"Error: {e}"
        if res["status"] != "ok":
            return None, None, None, None, res["status"]
        return (res["video"], res["comparison"], res["side_by_side"],
                res["slider"], f"done ({res['fps']:.2f} frames/s)")

    def process_image(image, task, tile, use_custom, custom_ckpt,
                      custom_yml):
        try:
            res = restore_image(
                image, task, ckpt_dir, options_dir,
                tile=int(tile) if tile else 0,
                custom_model_path=custom_ckpt if use_custom else "",
                custom_config_path=custom_yml if use_custom else "")
        except Exception as e:
            return None, None, f"Error: {e}"
        return res["image"], res["side_by_side"], "done"

    with gr.Blocks(title="Turtle Video Restoration (TPU)") as demo:
        gr.Markdown("# Turtle Video Restoration — TPU")
        with gr.Accordion("Custom model", open=False):
            use_custom = gr.Checkbox(label="Use custom checkpoint/config",
                                     value=False)
            custom_ckpt = gr.Textbox(label="Checkpoint path (.pth or orbax)")
            custom_yml = gr.Textbox(label="Option file path (.yml)")
        with gr.Tab("Video Restoration"):
            with gr.Row():
                with gr.Column():
                    vid = gr.Video(label="Input video")
                    task = gr.Dropdown(list(SUPPORTED_TASKS), label="Task",
                                       value=list(SUPPORTED_TASKS)[0])
                    tile = gr.Number(label="Tile size (0 = whole frame)",
                                     value=0)
                    btn = gr.Button("Restore")
                with gr.Column():
                    out_v = gr.Video(label="Restored")
                    out_c = gr.Video(label="Comparison (wipe)")
                    out_s = gr.Video(label="Side by side")
                    out_sl = gr.Video(label="Slider comparison")
                    status = gr.Textbox(label="Status")
            btn.click(process,
                      [vid, task, tile, use_custom, custom_ckpt, custom_yml],
                      [out_v, out_c, out_s, out_sl, status])
        with gr.Tab("Image Restoration"):
            with gr.Row():
                with gr.Column():
                    img = gr.Image(label="Input image", type="filepath")
                    itask = gr.Dropdown(list(SUPPORTED_TASKS), label="Task",
                                        value=list(SUPPORTED_TASKS)[0])
                    itile = gr.Number(label="Tile size (0 = whole frame)",
                                      value=0)
                    ibtn = gr.Button("Restore image")
                with gr.Column():
                    iout = gr.Image(label="Restored")
                    isbs = gr.Image(label="Side by side")
                    istatus = gr.Textbox(label="Status")
            ibtn.click(process_image,
                       [img, itask, itile, use_custom, custom_ckpt,
                        custom_yml],
                       [iout, isbs, istatus])
    return demo


def main():
    from turtlevsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--options-dir", default="options")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; the inference CLI "
                         "(python -m turtlevsr_tpu.cli.infer) provides the "
                         "same pipeline headless")
    demo = create_ui(args.ckpt_dir, args.options_dir)
    demo.launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
