"""Throughput cost of zoom-out re-acquisition (recover_context) in the scan
runtime.

The recovery branch is a per-stream ``jnp.where`` on the crop context
(tracker/runtime.py) — static shapes, no extra model evaluations — so the
expected cost is ~zero. This measures it instead of asserting it: the
bench.py protocol (20 warmup + N timed chunk calls, device-resident input,
best-of-2 passes) run back-to-back in ONE process for recover_context=0
and recover_context=3, same streams/weights/chunk.

    python tools/recovery_throughput.py                  # real TPU
    BENCH_STREAMS=8 BENCH_CHUNK=8 BENCH_TIMED=4 \
        python tools/recovery_throughput.py --platform cpu   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_CALLS = int(os.environ.get("BENCH_WARMUP", 10))
TIMED_CALLS = int(os.environ.get("BENCH_TIMED", 40))
STREAMS = int(os.environ.get("BENCH_STREAMS", 128))
CHUNK = int(os.environ.get("BENCH_CHUNK", 64))
REPEATS = int(os.environ.get("BENCH_REPEATS", 2))


def measure(tracker, frames0, chunk, bboxes) -> float:
    state = tracker.init(frames0, bboxes)
    outs = None
    for _ in range(max(WARMUP_CALLS, 1)):
        state, outs = tracker.track(state, chunk)
    np.asarray(outs["bbox"][-1])  # device sync
    elapsed = []
    for _ in range(REPEATS):
        t0 = time.time()
        for _ in range(TIMED_CALLS):
            state, outs = tracker.track(state, chunk)
        np.asarray(outs["bbox"][-1])
        np.asarray(state.bbox)
        elapsed.append(time.time() - t0)
    return TIMED_CALLS * STREAMS * CHUNK / float(np.min(elapsed))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--contexts", default="0,3")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from feartracker_tpu.evaluate.harness import build_scan_tracker, synthetic_streams

    frames0, chunk, bboxes = synthetic_streams(STREAMS, CHUNK)
    results = {}
    prov = None
    for ctx in [float(c) for c in args.contexts.split(",")]:
        kw = {} if ctx == 0.0 else dict(recover_context=ctx)
        tracker, prov = build_scan_tracker(**kw)
        fps = measure(tracker, frames0, chunk, bboxes)
        results[f"c{ctx:g}"] = round(fps, 1)
        print(json.dumps({"recover_context": ctx, "fps": round(fps, 1),
                          "streams": STREAMS, "chunk": CHUNK,
                          "weights": prov}), flush=True)

    keys = list(results)
    if len(keys) >= 2:
        base, rec = results[keys[0]], results[keys[1]]
        print(json.dumps({"summary": "recovery_overhead",
                          "baseline_fps": base, "recovery_fps": rec,
                          "overhead_pct": round(100.0 * (1 - rec / base), 2),
                          "weights": prov}), flush=True)


if __name__ == "__main__":
    main()
