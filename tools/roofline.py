"""Roofline analysis of the compiled scan step (VERDICT.md round-1 item #4).

Compiles the multi-stream track step for a given S, pulls XLA's own cost
model (flops + bytes accessed), and compares measured wall time against the
v5e compute and HBM rooflines:

    v5e-1 peaks: 197 TFLOP/s bf16, 819 GB/s HBM.

Prints per-S: measured time, flop utilization (MFU), HBM utilization, and
which roofline binds — turning round-1's "within ~2x of the HBM roofline"
note into a measured statement.

    python tools/roofline.py --streams 128 --timed 8
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
V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="128")
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--timed", type=int, default=8)
    args = ap.parse_args()

    import jax

    from feartracker_tpu.evaluate.harness import build_scan_tracker, synthetic_streams

    tracker, provenance = build_scan_tracker(TRACKER_ML)
    print(f"[setup] weights: {provenance}", file=sys.stderr)

    for S in [int(s) for s in args.streams.split(",")]:
        frames0, chunk, bboxes = synthetic_streams(S, args.chunk)
        state = tracker.init(frames0, bboxes)

        lowered = jax.jit(tracker._track_impl, donate_argnums=(3,)).lower(
            tracker.variables, tracker._folded, tracker._gate, state, chunk
        )
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        # XLA's cost model counts a while-loop (lax.scan) body ONCE — scale
        # by the trip count for true per-call totals. Verified on this
        # backend: flops AND bytes are identical for T in {4,16,32} (T=1
        # differs slightly — the loop is elided and fusion changes).
        flops = ca.get("flops", 0.0) * args.chunk
        bytes_total = ca.get("bytes accessed", 0.0) * args.chunk

        out = None
        for _ in range(args.warmup):
            state, out = tracker.track(state, chunk)
        np.asarray(out["bbox"][-1])
        t0 = time.time()
        for _ in range(args.timed):
            state, out = tracker.track(state, chunk)
        np.asarray(out["bbox"][-1])
        dt = (time.time() - t0) / args.timed

        frames_per_call = S * args.chunk
        compute_floor = flops / V5E_BF16_FLOPS
        hbm_floor = bytes_total / V5E_HBM_BPS
        print(json.dumps({
            "S": S,
            "ms_per_call": round(dt * 1e3, 2),
            "fps": round(frames_per_call / dt, 0),
            "xla_flops_per_call": flops,
            "xla_bytes_per_call": bytes_total,
            "flops_per_frame_G": round(flops / frames_per_call / 1e9, 3),
            "bytes_per_frame_MB": round(bytes_total / frames_per_call / 2**20, 2),
            "mfu_pct": round(100 * flops / dt / V5E_BF16_FLOPS, 1),
            "hbm_util_pct": round(100 * bytes_total / dt / V5E_HBM_BPS, 1),
            "compute_floor_ms": round(compute_floor * 1e3, 2),
            "hbm_floor_ms": round(hbm_floor * 1e3, 2),
            "binding_roofline": "hbm" if hbm_floor > compute_floor else "compute",
        }), flush=True)


if __name__ == "__main__":
    main()
