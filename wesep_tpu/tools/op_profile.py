"""Summarize a jax.profiler xplane trace: device-busy time per op class.

Companion to utils/profiling.trace — turns the raw .xplane.pb that
`jax.profiler.trace` writes into the table used for the BASELINE.md
speed-of-light attributions, without needing TensorBoard:

  python -m wesep_tpu.tools.op_profile /tmp/trace_dir [--top 20]

Groups the device plane's "XLA Ops" line by op-name prefix (fusion /
custom-call kernels / copies / ...) and, for fusions, by result shape.
Requires the tensorflow wheel's xplane proto (present in this image);
prints a no-op message when unavailable so the tool is safe everywhere.
"""

import argparse
import collections
import glob
import os
import re


def get_args():
    parser = argparse.ArgumentParser(description="xplane op profile")
    parser.add_argument("logdir", help="dir passed to jax.profiler.trace")
    parser.add_argument("--top", type=int, default=20)
    return parser.parse_args()


def load_xspace(logdir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        return None
    pbs = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not pbs:
        return None
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def op_table(xs, top: int = 20):
    """-> (device_plane_name, busy_ms, [(ms, pct, label)])."""
    plane = next(
        (p for p in xs.planes if "/device:" in p.name and p.lines), None
    )
    if plane is None:
        return None, 0.0, []
    ev_names = plane.event_metadata
    agg = collections.Counter()
    fusion_shapes = collections.Counter()
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names[ev.metadata_id].name
            m = re.match(r"%?([a-zA-Z\-_]+)", name)
            cat = m.group(1) if m else name[:32]
            dur = ev.duration_ps / 1e9  # ms
            agg[cat] += dur
            total += dur
            if cat.endswith("fusion") or cat == "fusion":
                sm = re.search(r"= ([a-z0-9]+\[[0-9,]*\])", name)
                fusion_shapes[sm.group(1) if sm else "?"] += dur
    rows = [
        (ms, 100.0 * ms / max(total, 1e-9), cat)
        for cat, ms in agg.most_common(top)
    ]
    frows = [
        (ms, 100.0 * ms / max(total, 1e-9), f"fusion -> {shape}")
        for shape, ms in fusion_shapes.most_common(max(top // 2, 5))
    ]
    return plane.name, total, rows + frows


def main():
    args = get_args()
    xs = load_xspace(args.logdir)
    if xs is None:
        print("no xplane trace found (or xplane proto unavailable)")
        return
    plane, total, rows = op_table(xs, args.top)
    if plane is None:
        print("no device plane with XLA Ops in the trace")
        return
    print(f"{plane}: device busy {total:.1f} ms")
    for ms, pct, label in rows:
        print(f"  {ms:9.2f} ms {pct:5.1f}%  {label}")


if __name__ == "__main__":
    main()
