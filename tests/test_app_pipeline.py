"""The web app's restoration pipeline (headless — gradio not required)."""

import os
import shutil

import numpy as np
import pytest


def test_restore_video_pipeline(tmp_path):
    import cv2

    from turtlevsr_tpu.app import restore_video
    from test_cli import TINY_YML

    # tiny option file masquerading as the GoPro task config
    options_dir = tmp_path / "options"
    options_dir.mkdir()
    (options_dir / "Turtle_Deblur_Gopro.yml").write_text(
        TINY_YML.format(root=tmp_path))

    # synthesize a short input video
    rng = np.random.RandomState(0)
    mp4 = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for _ in range(4):
        vw.write((rng.rand(64, 64, 3) * 255).astype(np.uint8))
    vw.release()

    res = restore_video(mp4, "Video Deblurring (GoPro)",
                        ckpt_dir=str(tmp_path), options_dir=str(options_dir),
                        max_frames=3)
    assert res["status"] == "ok"
    for key in ("video", "comparison", "side_by_side", "slider"):
        assert os.path.exists(res[key]), key
        assert os.path.getsize(res[key]) > 0, key
    assert res["fps"] > 0
    # side-by-side frames are double width
    cap = cv2.VideoCapture(res["side_by_side"])
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    cap.release()


def test_restore_image_pipeline(tmp_path):
    from PIL import Image

    from turtlevsr_tpu.app import restore_image
    from test_cli import TINY_YML

    options_dir = tmp_path / "options"
    options_dir.mkdir()
    custom_yml = options_dir / "custom.yml"
    custom_yml.write_text(TINY_YML.format(root=tmp_path))
    (options_dir / "Turtle_Deblur_Gopro.yml").write_text(
        TINY_YML.format(root=tmp_path))

    rng = np.random.RandomState(1)
    png = str(tmp_path / "in.png")
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(png)

    # exercise the custom-config override path too (app.py:493-500)
    res = restore_image(png, "Video Deblurring (GoPro)",
                        ckpt_dir=str(tmp_path), options_dir=str(options_dir),
                        custom_config_path=str(custom_yml))
    assert res["status"] == "ok"
    out = np.asarray(Image.open(res["image"]))
    assert out.shape == (64, 64, 3)
    sbs = np.asarray(Image.open(res["side_by_side"]))
    assert sbs.shape == (64, 128, 3)
