"""Gradio web UI — the app.py equivalent (task registry, video/image
restoration, side-by-side and wipe comparison outputs, cancellable jobs).

Requires ``gradio`` (optional; not bundled in minimal images):

    python -m turtlevsr_tpu.app --ckpt-dir checkpoints/

Differences from the reference (app.py:1-1029): jobs run in daemon threads
with a cooperative ``threading.Event`` cancel checked between frames —
instead of injecting SystemExit into threads via ctypes
(app.py:66-87) — and the per-task registry maps to local checkpoint paths
supplied at launch instead of hard-coded ones.
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


def restore_video(video_path: str, task: str, ckpt_dir: str,
                  options_dir: str, tile: int = 0, max_frames: int = 0,
                  job: Job | None = None, progress_cb=None) -> dict:
    """Extract frames -> stream restore -> assemble result + comparisons."""
    import jax

    from turtlevsr_tpu.config.options import load_options, model_config_from_options
    from turtlevsr_tpu.eval.engine import InferenceEngine
    from turtlevsr_tpu.io.checkpoint import restore_params
    from turtlevsr_tpu.models.turtle import init_params
    from turtlevsr_tpu.utils.img import float_from_img, img_from_float, imwrite
    from turtlevsr_tpu.utils.video_io import (
        comparison_wipe_video, extract_frames, frames_to_video)

    job = job or Job()
    yml, ckpt_name = SUPPORTED_TASKS[task]
    opt = load_options(os.path.join(options_dir, yml), is_train=False)
    opt["kernels"] = "pallas"
    cfg = model_config_from_options(opt)

    ckpt = None
    for cand in (os.path.join(ckpt_dir, ckpt_name),
                 os.path.join(ckpt_dir, ckpt_name + ".pth")):
        if os.path.exists(cand):
            ckpt = cand
            break
    if ckpt:
        params = restore_params(ckpt)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)

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
    t0 = time.time()
    for i, f in enumerate(files):
        if job.cancel.is_set():
            return {"status": "cancelled"}
        img = float_from_img(np.asarray(
            Image.open(os.path.join(frames_dir, f)).convert("RGB")))
        out = engine.step(img)
        imwrite(img_from_float(out), os.path.join(out_dir, f))
        job.progress = 0.3 + 0.5 * (i + 1) / len(files)
        if progress_cb:
            progress_cb(job.progress)
    fps = len(files) / (time.time() - t0)

    result = os.path.join(work, "restored.mp4")
    frames_to_video(out_dir, result)
    wipe = os.path.join(work, "comparison.mp4")
    comparison_wipe_video(frames_dir, out_dir, wipe)
    return {"status": "ok", "video": result, "comparison": wipe, "fps": fps}


def create_ui(ckpt_dir: str, options_dir: str):
    import gradio as gr

    jobs: dict = {}

    def process(video, task, tile, session=""):
        job = Job()
        jobs[id(job)] = job
        try:
            res = restore_video(video, task, ckpt_dir, options_dir,
                                tile=int(tile) if tile else 0, job=job)
        except Exception as e:  # surface errors in the UI
            return None, None, f"Error: {e}"
        if res["status"] != "ok":
            return None, None, res["status"]
        return res["video"], res["comparison"], \
            f"done ({res['fps']:.2f} frames/s)"

    with gr.Blocks(title="Turtle Video Restoration (TPU)") as demo:
        gr.Markdown("# Turtle Video Restoration — TPU")
        with gr.Row():
            with gr.Column():
                vid = gr.Video(label="Input video")
                task = gr.Dropdown(list(SUPPORTED_TASKS), label="Task",
                                   value=list(SUPPORTED_TASKS)[0])
                tile = gr.Number(label="Tile size (0 = whole frame)", value=0)
                btn = gr.Button("Restore")
            with gr.Column():
                out_v = gr.Video(label="Restored")
                out_c = gr.Video(label="Comparison (wipe)")
                status = gr.Textbox(label="Status")
        btn.click(process, [vid, task, tile], [out_v, out_c, status])
    return demo


def main():
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
