"""Per-op device-time report from a jax.profiler trace (xplane.pb).

Aggregates the TPU 'XLA Ops' timeline by HLO op, attributes each op to its
source call site (first frame of the op's source_stack inside this repo,
preferring models/ over kernels/ wrappers), and prints ms/frame, achieved
TF/s and GB/s per bucket. This is the honest in-context attribution the
micro-benchmarks in tools/profile_blocks.py can't give (they re-derive the
XLA decomposition; the shipped pallas path fuses differently).

Usage:
  python -m turtlevsr_tpu.cli.bench -opt options/... --size 720 1280 \
      --iters 10 --trace_dir /tmp/trace
  python tools/trace_report.py /tmp/trace [--frames 10] [--by op|site|cat]
"""

import argparse
import collections
import glob
import os
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, pbs[-1]


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def site_of(stack: str) -> str:
    """First repo frame that is not a kernel-internal/vjp wrapper: the
    model-level call site. Falls back to the deepest repo frame."""
    frames = [f.strip() for f in stack.split("\n") if f.strip()]
    repo = [f for f in frames if f.startswith(_REPO)]
    for f in repo:
        rel = os.path.relpath(f.split(":")[0], _REPO)
        if not rel.startswith(("turtlevsr_tpu/kernels",)):
            return ":".join(os.path.relpath(f, _REPO).split(":")[:2])
    return (":".join(os.path.relpath(repo[0], _REPO).split(":")[:2])
            if repo else "<outside repo>")


def kernel_of(stack: str) -> str:
    """Deepest repo frame (the kernel entry) — distinguishes which pallas
    kernel runs at a shared model-level site."""
    frames = [f.strip() for f in stack.split("\n") if f.strip()]
    repo = [f for f in frames if f.startswith(_REPO)]
    return (":".join(os.path.relpath(repo[0], _REPO).split(":")[:2])
            if repo else "<outside repo>")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--frames", type=int, default=None,
                    help="executions in the trace (default: count of the "
                         "most-frequent XLA module event)")
    ap.add_argument("--by", default="site", choices=["site", "op", "cat"])
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    xs, path = load_xspace(args.trace_dir)
    tpu = [p for p in xs.planes if "TPU" in p.name]
    if not tpu:
        sys.exit("no TPU plane in trace")
    tpu = tpu[0]
    sm = {k: v.name for k, v in tpu.stat_metadata.items()}
    em = tpu.event_metadata

    mods = [l for l in tpu.lines if l.name == "XLA Modules"]
    frames = args.frames
    if frames is None and mods:
        byname = collections.Counter(
            em[e.metadata_id].display_name or em[e.metadata_id].name
            for e in mods[0].events)
        frames = max(byname.values()) if byname else 1
    frames = frames or 1

    ops = [l for l in tpu.lines if l.name == "XLA Ops"][0]

    def md_stats(md):
        return {sm[s.metadata_id]: s for s in md.stats}

    agg = collections.defaultdict(lambda: [0.0, 0, 0, 0])  # us, n, flop, byte
    for e in ops.events:
        md = em[e.metadata_id]
        st = md_stats(md)
        dur = 0
        for s in e.stats:
            if sm[s.metadata_id] == "device_duration_ps":
                dur = s.uint64_value / 1e6  # ps -> us
        cat = st["hlo_category"].str_value if "hlo_category" in st else "?"
        if args.by == "cat":
            key = cat
        elif args.by == "op":
            key = md.display_name or md.name.split(" = ")[0]
        else:
            src = st.get("source_stack")
            key = (site_of(src.str_value) if src is not None
                   else f"<no-src:{cat}>")
            if src is not None and cat == "custom-call":
                key += f"  [{kernel_of(src.str_value)}]"
        a = agg[key]
        a[0] += dur
        a[1] += 1
        a[2] += st["flops"].int64_value if "flops" in st else 0
        a[3] += (st["bytes_accessed"].int64_value
                 if "bytes_accessed" in st else 0)

    total = sum(a[0] for a in agg.values())
    print(f"trace: {path}\nframes: {frames}   "
          f"device total: {total / frames / 1e3:.2f} ms/frame\n")
    print(f"{'ms/frm':>8} {'%':>5} {'n':>5} {'TF/s':>6} {'GB/s':>6}  key")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    shown = 0.0
    for k, (us, n, fl, by) in rows[:args.top]:
        tfs = fl / (us * 1e6) if us else 0  # flop/us -> TF/s = /1e6
        gbs = by / (us * 1e3) if us else 0
        shown += us
        print(f"{us / frames / 1e3:8.3f} {us / total * 100:5.1f} "
              f"{n // frames:5d} {tfs:6.1f} {gbs:6.1f}  {k[:120]}")
    rest = total - shown
    print(f"{rest / frames / 1e3:8.3f} {rest / total * 100:5.1f}"
          f"       (everything else)")


if __name__ == "__main__":
    main()
