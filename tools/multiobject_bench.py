"""Measure multi-object tracking throughput: shared-frame vs host-tiled feed.

N objects tracked through ONE video. The baseline (the only option before
ScanTracker's multi-object mode) tiles the frame chunk to (T, N, H, W, 3) on
the host and pays N× the host→device transfer; the shared mode ships
(T, H, W, 3) once and broadcasts in-graph. On a tunnel/PCIe-attached chip the
transfer is the live-serving bottleneck, so the win approaches N× for
host-resident frames. (Device-resident inputs — the bench.py headline — are
unaffected by this choice.)

Usage:
  python tools/multiobject_bench.py --objects 4,16 --chunk 16 --chunks 4
Prints one JSON line per (mode, N).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--objects", default="4,16")
    ap.add_argument("--chunk", type=int, default=16, help="frames per track() call")
    ap.add_argument("--chunks", type=int, default=4, help="timed chunks per config")
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--device_resident", action="store_true",
                    help="pre-stage the feed on device (isolates in-graph "
                    "broadcast cost from the H2D transfer difference)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.runtime import ScanTracker

    H, W, T = args.height, args.width, args.chunk
    rng = np.random.RandomState(0)
    video = rng.randint(0, 255, (T, H, W, 3)).astype(np.uint8)
    frame0 = video[0]

    model = FEARNet(dtype=jnp.bfloat16)
    variables = load_variables("fear_xs")
    tracker = ScanTracker(model, variables, TrackerConfig(), dtype=jnp.bfloat16)

    for n in [int(x) for x in args.objects.split(",")]:
        boxes = np.stack(
            [[20 + 7 * i % (W - 120), 20 + 11 * i % (H - 120), 60, 80] for i in range(n)]
        ).astype(np.float32)
        for mode in ("tiled", "shared"):
            if mode == "tiled":
                feed0 = np.broadcast_to(frame0, (n, H, W, 3)).copy()
                feed = np.broadcast_to(video[:, None], (T, n, H, W, 3)).copy()
            else:
                feed0, feed = frame0, video
            if args.device_resident:
                feed0, feed = jax.device_put(feed0), jax.device_put(feed)
                jax.block_until_ready(feed)
            state = tracker.init(feed0, boxes)
            state, out = tracker.track(state, feed)  # compile + warm
            np.asarray(out["bbox"])
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                state, out = tracker.track(state, feed)
                np.asarray(out["bbox"])  # host fetch = real sync
            dt = time.perf_counter() - t0
            fps = args.chunks * T * n / dt
            print(json.dumps({
                "mode": mode, "objects": n, "chunk": T, "hw": [H, W],
                "h2d_mb_per_chunk": round(feed.nbytes / 1e6, 1),
                "tracked_fps": round(fps, 1),
                "s_per_chunk": round(dt / args.chunks, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
