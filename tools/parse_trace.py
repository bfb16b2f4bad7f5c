"""Summarize a jax.profiler xplane trace: top ops by device time.

Parses the xplane.pb with tensorflow's profiler protos (no TensorBoard UI on
this box) and aggregates event durations per line on the TPU device plane,
grouping XLA fusion names into coarse buckets (conv / correlation / crop
matmuls / decode / elementwise) so the per-frame step breakdown in
BENCHMARKS.md is measured, not estimated.

    python tools/parse_trace.py /tmp/trace128
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_planes(trace_dir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto location moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as fh:
        space.ParseFromString(fh.read())
    return space


def summarize(space, top: int = 25):
    """Aggregate the 'XLA Ops' line of the TPU plane.

    Use the op NAME PREFIX ('%fusion.954' → 'fusion') for kind bucketing —
    the full HLO text embeds operand names ('copy.12' etc.) that poison
    substring matching. The 'Async XLA Ops' line (DMA prefetches) is
    deliberately ignored: those overlap compute and their summed durations
    exceed wall time several-fold."""
    import re

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
        if line is None:
            continue
        kinds: dict = collections.Counter()
        shapes: dict = collections.Counter()
        total = 0.0
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            key = name.split(" = ")[0].strip("%")
            if "while" in key or name.startswith("jit_") or "body" in key:
                continue  # container events; counting them double-counts
            us = ev.duration_ps / 1e6
            total += us
            kind = re.sub(r"[.-]?\d+$", "", key)
            kinds[kind] += us
            if kind == "fusion":
                m = re.search(r"= (\w+\[[\d,]+\])", name)
                shapes[m.group(1) if m else "?"] += us
        print(f"\n== plane {plane.name}: {total/1e3:.1f} ms device time ==")
        for k, us in kinds.most_common(top):
            print(f"  {us/1e3:8.2f} ms {100*us/total:5.1f}%  {k}")
        print("fusion time by output shape:")
        for k, us in shapes.most_common(top):
            print(f"  {us/1e3:7.2f} ms {100*us/total:5.1f}%  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    summarize(load_planes(args.trace_dir), args.top)


if __name__ == "__main__":
    main()
