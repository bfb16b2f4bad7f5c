"""On-chip validation + timing of the fused IR-block trunk vs the XLA trunk.

Stage 1 (numerics): small S — fused vs XLA trunk trajectories on the same
synthetic streams must agree (bf16 tolerance).
Stage 2 (timing): bench.py protocol (warmup + timed track() calls, scan-
amortized, host-fetch synced) for both trunk impls at the headline S.

    python tools/fused_trunk_bench.py --streams 128 --chunk 32 --timed 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl: str, S: int, T: int, warmup: int, timed: int, repeats: int):
    from feartracker_tpu.evaluate.harness import build_scan_tracker, synthetic_streams

    tracker, prov = build_scan_tracker(trunk_impl=impl)
    frames0, chunk, bboxes = synthetic_streams(S, T)
    t0 = time.time()
    state = tracker.init(frames0, bboxes)
    state, outs = tracker.track(state, chunk)
    boxes_first = np.asarray(outs["bbox"])  # (T, S, 4) after first chunk
    compile_s = time.time() - t0

    for _ in range(warmup):
        state, outs = tracker.track(state, chunk)
    np.asarray(outs["bbox"][-1])

    elapsed = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(timed):
            state, outs = tracker.track(state, chunk)
        np.asarray(outs["bbox"][-1])
        np.asarray(state.bbox)
        elapsed.append(time.time() - t0)
    ms_call = float(np.min(elapsed)) / timed * 1e3
    fps = timed * S * T / float(np.min(elapsed))
    return {
        "impl": impl, "weights": prov, "compile_s": round(compile_s, 1),
        "ms_per_call": round(ms_call, 1), "tracked_fps": round(fps, 1),
        "boxes_first_chunk": boxes_first,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--timed", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--check_streams", type=int, default=8,
                    help="small-S numeric cross-check before timing (0 = skip)")
    args = ap.parse_args()

    if args.check_streams:
        ref = run("xla", args.check_streams, args.chunk, 0, 1, 1)
        got = run("fused", args.check_streams, args.chunk, 0, 1, 1)
        dev = np.abs(ref["boxes_first_chunk"] - got["boxes_first_chunk"])
        print(json.dumps({
            "check": "fused vs xla boxes, first chunk",
            "max_abs_px": round(float(dev.max()), 3),
            "mean_abs_px": round(float(dev.mean()), 4),
        }))

    for impl in ("xla", "fused"):
        r = run(impl, args.streams, args.chunk, args.warmup, args.timed, args.repeats)
        r.pop("boxes_first_chunk")
        print(json.dumps(r))


if __name__ == "__main__":
    main()
