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
    assert os.path.exists(res["video"])
    assert os.path.exists(res["comparison"])
    assert res["fps"] > 0
