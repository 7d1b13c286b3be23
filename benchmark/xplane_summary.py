#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: per-op device time, aggregated.

The TensorBoard profile plugin's converter is version-broken in this image
(xspace_to_tools_data missing), so this parses the xplane.pb directly with
the tsl proto that ships inside tensorflow — the op-level evidence tool for
the resident-region device-tax hunt (docs/PERF_NOTES.md).

    python benchmark/xplane_summary.py /tmp/trace1 [--top 30] [--by-line]

Aggregates XEvent durations on device planes (plane name contains "TPU" or
"/device:"), grouped by the event metadata name (the HLO op name).
"""

import argparse
import glob
import gzip
import os
import sys
from collections import defaultdict


def load_xspace(path: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    data = open(path, "rb").read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(data)
    return xs


def summarize(xspace, top: int, device_only: bool = True):
    rows = []
    for plane in xspace.planes:
        is_dev = ("TPU" in plane.name or "/device:" in plane.name
                  or "Device" in plane.name)
        if device_only and not is_dev:
            continue
        ev_meta = plane.event_metadata
        agg = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
        if not agg:
            continue
        total_ps = sum(v[0] for v in agg.values())
        print(f"\n== plane: {plane.name} (total {total_ps / 1e12:.3f} s busy, "
              f"{len(agg)} distinct ops) ==")
        for name, (ps, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {ps / 1e9:10.3f} ms {n:7d}x  {name[:110]}")
        rows.append((plane.name, total_ps, agg))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--all-planes", action="store_true")
    args = p.parse_args()

    pats = [
        os.path.join(args.trace_dir, "**", "*.xplane.pb"),
        os.path.join(args.trace_dir, "**", "*.xplane.pb.gz"),
    ]
    files = sorted(sum((glob.glob(g, recursive=True) for g in pats), []))
    if not files:
        print(f"no xplane.pb under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)
    for f in files:
        print(f"# {f}")
        summarize(load_xspace(f), args.top, device_only=not args.all_planes)


if __name__ == "__main__":
    main()
