"""Stream-count (S) throughput sweep on the real chip, with variance control.

Round-1 left a puzzle (VERDICT.md weak #1): S=128 -> 19.7-22.3k FPS but
S=192 -> 15.1k, S=256 -> 18.3k — non-monotonic. Those were single runs
through a tunnel with ~15% run-to-run drift. This tool measures properly:

* per-call wall times, reported as median + IQR (not one mean);
* S values interleaved round-robin across repeats so tunnel drift hits every
  S equally;
* inputs device-resident, sync via host fetch of the final bbox.

Usage: python tools/sweep_streams.py --streams 64,128,160,192,256 \
          --warmup 5 --timed 10 --repeats 3 [--profile-dir /tmp/trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="64,128,160,192,256")
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--timed", type=int, default=10, help="timed calls per repeat")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--profile-dir", default=None, help="jax.profiler trace for each S")
    ap.add_argument("--memory", action="store_true", help="print compiled memory analysis")
    ap.add_argument("--trunk_impl", default="xla", choices=["xla", "fused"],
                    help="'fused' = fused IR-block Pallas trunk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feartracker_tpu.evaluate.harness import build_scan_tracker, synthetic_streams

    s_values = [int(s) for s in args.streams.split(",")]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    tracker, provenance = build_scan_tracker(TRACKER_ML, dtype=dtype, trunk_impl=args.trunk_impl)
    print(f"[setup] weights: {provenance}, trunk: {args.trunk_impl}")

    def run_one(S: int, warm: int) -> list:
        """Set up S streams (device-resident), warm, return per-repeat
        ms/call. Inputs live only for this call — the full set of S values
        does not fit HBM together (~28 GB of frames)."""
        frames0, chunk, bboxes = synthetic_streams(S, args.chunk)
        state = tracker.init(frames0, bboxes)
        out = None
        for _ in range(warm):
            state, out = tracker.track(state, chunk)
        np.asarray(out["bbox"][-1])
        reps = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.timed):
                state, out = tracker.track(state, chunk)
            np.asarray(out["bbox"][-1])  # sync
            reps.append((time.time() - t0) / args.timed)
        return reps

    times: dict = {S: [] for S in s_values}
    # two interleaved passes over all S so tunnel drift hits each S twice
    for p in range(2):
        for S in s_values:
            reps = run_one(S, args.warmup if p == 0 else max(args.warmup // 2, 1))
            times[S].extend(reps)
            for dt in reps:
                print(f"[pass {p}] S={S}: {dt*1e3:.1f} ms/call -> "
                      f"{S*args.chunk/dt:,.0f} FPS", flush=True)

    print("\n== summary (median over repeats) ==")
    results = []
    for S in s_values:
        med = float(np.median(times[S]))
        lo, hi = np.percentile(times[S], [25, 75])
        fps = S * args.chunk / med
        per_frame_us = med / (S * args.chunk) * 1e6
        results.append({
            "S": S, "ms_per_call_median": round(med * 1e3, 2),
            "iqr_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)],
            "fps": round(fps, 0), "us_per_frame": round(per_frame_us, 3),
        })
        print(json.dumps(results[-1]))

    if args.profile_dir:
        S = s_values[-1]
        frames0, chunk, bboxes = synthetic_streams(S, args.chunk)
        state = tracker.init(frames0, bboxes)
        state, out = tracker.track(state, chunk)  # warm
        np.asarray(out["bbox"][-1])
        with jax.profiler.trace(args.profile_dir):
            state, out = tracker.track(state, chunk)
            np.asarray(out["bbox"][-1])
        print(f"trace written to {args.profile_dir}")


if __name__ == "__main__":
    main()
