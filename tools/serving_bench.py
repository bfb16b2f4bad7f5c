"""StreamPool serving benchmark: per-frame vs chunked, serial vs pipelined.

Quantifies the serving rules in docs/SERVING.md on the actual device:
per-frame `step` / `step_async` (dispatch-bound on remote-attached setups)
against chunked `step_chunk` / `step_chunk_async` (one scan dispatch per T
frames). Prints one JSON line per mode.

    python tools/serving_bench.py --streams 128 --chunk 8 --depth 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, n: int) -> float:
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


def _pipelined(dispatch, depth: int, n: int) -> float:
    pending = []
    t0 = time.time()
    for _ in range(n):
        if len(pending) >= depth:
            pending.pop(0).result()
        pending.append(dispatch())
    for p in pending:
        p.result()
    return (time.time() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--timed", type=int, default=25)
    args = ap.parse_args()

    import jax.numpy as jnp

    from feartracker_tpu.evaluate.harness import DEMO_BBOX, build_scan_tracker
    from feartracker_tpu.tracker.serving import StreamPool

    tracker, provenance = build_scan_tracker()
    print(f"[setup] weights: {provenance}", file=sys.stderr)
    S, T = args.streams, args.chunk
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (256, 480, 3), dtype=np.uint8).astype(np.float32)
    pool = StreamPool(tracker, capacity=S, frame_hw=(256, 480))
    for _ in range(S):
        pool.add(frame, np.asarray(DEMO_BBOX))
    frames = jnp.asarray(np.broadcast_to(frame, (S, 256, 480, 3)))
    chunk = jnp.asarray(np.broadcast_to(frame, (T, S, 256, 480, 3)))

    for _ in range(args.warmup):
        pool.step(frames)
        pool.step_chunk(chunk)

    results = {
        "frame_serial": (_timed(lambda: pool.step(frames), args.timed), S),
        "frame_pipelined": (_pipelined(lambda: pool.step_async(frames), args.depth, 2 * args.timed), S),
        "chunk_serial": (_timed(lambda: pool.step_chunk(chunk), args.timed), S * T),
        "chunk_pipelined": (_pipelined(lambda: pool.step_chunk_async(chunk), args.depth, 2 * args.timed), S * T),
    }
    for mode, (dt, frames_per_call) in results.items():
        print(json.dumps({
            "mode": mode, "streams": S, "chunk": T if mode.startswith("chunk") else 1,
            "depth": args.depth if "pipelined" in mode else 1,
            "ms_per_call": round(dt * 1e3, 1),
            "live_fps": round(frames_per_call / dt, 0),
        }))


if __name__ == "__main__":
    main()
