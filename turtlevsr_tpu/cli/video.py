"""Video/frame conversion CLI (video_to_frames.py + make_video.py).

    python -m turtlevsr_tpu.cli.video extract in.mp4 frames/ [--fps 15]
    python -m turtlevsr_tpu.cli.video assemble frames/ out.mp4 [--fps 30]
    python -m turtlevsr_tpu.cli.video compare input/ pred/ out.mp4
"""

from __future__ import annotations

import argparse

from turtlevsr_tpu.utils.video_io import (
    comparison_wipe_video,
    extract_frames,
    frames_to_video,
)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract")
    e.add_argument("video")
    e.add_argument("outdir")
    e.add_argument("--fps", type=float, default=None)
    e.add_argument("--format", default="png")

    a = sub.add_parser("assemble")
    a.add_argument("frames")
    a.add_argument("output")
    a.add_argument("--fps", type=float, default=30.0)

    c = sub.add_parser("compare")
    c.add_argument("input_dir")
    c.add_argument("pred_dir")
    c.add_argument("output")
    c.add_argument("--fps", type=float, default=30.0)

    args = p.parse_args()
    if args.cmd == "extract":
        n = extract_frames(args.video, args.outdir, args.fps, args.format)
        print(f"extracted {n} frames to {args.outdir}")
    elif args.cmd == "assemble":
        n = frames_to_video(args.frames, args.output, args.fps)
        print(f"wrote {args.output} ({n} frames)")
    else:
        n = comparison_wipe_video(args.input_dir, args.pred_dir, args.output,
                                  args.fps)
        print(f"wrote {args.output} ({n} frames)")


if __name__ == "__main__":
    main()
