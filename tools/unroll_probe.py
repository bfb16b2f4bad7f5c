"""Final HBM-roofline probe (VERDICT r2 #8): scan-body unrolling.

The round-2 op profile attributes 92.9% of device time to conv fusions at
~49% effective HBM bandwidth, with scan-boundary copies at 3.0%. This probe
tests the one remaining structural lever: unrolling the per-frame scan body
K× (``lax.scan(unroll=K)``) — 1/K the scan boundary copies and a K-step
fusion window for XLA. If the move is inside the measured tunnel noise floor
(~10%), the single-chip ceiling paragraph gets written and single-chip perf
optimization closes permanently.

    python tools/unroll_probe.py            # unroll 1, 2, 4 on the real chip
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = int(os.environ.get("PROBE_WARMUP", 5))
TIMED = int(os.environ.get("PROBE_TIMED", 30))
STREAMS = int(os.environ.get("PROBE_STREAMS", 128))
CHUNK = int(os.environ.get("PROBE_CHUNK", 64))
REPEATS = int(os.environ.get("PROBE_REPEATS", 2))

VIDEO = "/root/reference/assets/test.mp4"


def measure(unroll: int) -> float:
    from feartracker_tpu.evaluate.harness import build_scan_tracker, synthetic_streams
    from feartracker_tpu.utils.video import read_video

    try:
        video = read_video(VIDEO, max_frames=CHUNK + 1)
    except Exception:
        video = None

    tracker, prov = build_scan_tracker(scan_unroll=unroll)
    frames0, chunk, bboxes = synthetic_streams(STREAMS, CHUNK, video=video)
    state = tracker.init(frames0, bboxes)
    outs = None
    for _ in range(max(WARMUP, 1)):
        state, outs = tracker.track(state, chunk)
    np.asarray(outs["bbox"][-1])

    elapsed = []
    for _ in range(REPEATS):
        t0 = time.time()
        for _ in range(TIMED):
            state, outs = tracker.track(state, chunk)
        np.asarray(outs["bbox"][-1])
        np.asarray(state.bbox)
        elapsed.append(time.time() - t0)
    fps = TIMED * STREAMS * CHUNK / float(np.min(elapsed))
    print(json.dumps({"unroll": unroll, "fps": round(fps, 1), "weights": prov,
                      "passes_s": [round(e, 2) for e in elapsed]}), flush=True)
    return fps


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--unrolls", default="1,2,4",
                    help="comma list (other knobs via PROBE_* env vars: "
                    "WARMUP/TIMED/STREAMS/CHUNK/REPEATS)")
    args = ap.parse_args()
    results = {u: measure(u) for u in (int(x) for x in args.unrolls.split(","))}
    base = results[1]
    for u, fps in results.items():
        print(f"unroll={u}: {fps:,.0f} FPS ({fps / base - 1:+.1%} vs unroll=1)")


if __name__ == "__main__":
    main()
