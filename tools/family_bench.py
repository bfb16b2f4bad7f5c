"""Family throughput on the real chip: fear_xs / fear_m / fear_l on the
scan runtime, same protocol shape as bench.py (warmup + timed chunk calls,
device-resident input, host-fetch sync).

Throughput is weight-independent, so fear_m/fear_l run random-init weights
(no trained checkpoints exist for the scale-ups — BENCHMARKS.md "Model
family"); fear_xs uses the recovered checkpoint as the same-process anchor.

Usage: python tools/family_bench.py --models fear_xs,fear_m,fear_l \
          --streams 128 --chunk 64 --warmup 3 --timed 10 --repeats 2
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"

TOWERNUM = {"fear_xs": 2, "fear_m": 2, "fear_l": 3}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", default="fear_xs,fear_m,fear_l")
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--timed", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.evaluate.harness import synthetic_streams
    from feartracker_tpu.models.fbnet import TRUNKS
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.runtime import ScanTracker

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for name in args.models.split(","):
        name = name.strip()
        model = FEARNet(
            trunk_blocks=TRUNKS[name], towernum=TOWERNUM.get(name, 2), dtype=dtype
        )
        if name == "fear_xs":
            try:
                variables = load_variables(TRACKER_ML)
                provenance = "fear_xs"
            except Exception:
                variables, provenance = None, "random"
        else:
            variables, provenance = None, "random"
        if variables is None:
            template = jnp.zeros((1, 128, 128, 3), jnp.float32)
            search = jnp.zeros((1, 256, 256, 3), jnp.float32)
            variables = FEARNet(
                trunk_blocks=TRUNKS[name], towernum=TOWERNUM.get(name, 2)
            ).init(jax.random.PRNGKey(0), (template, search))

        tracker = ScanTracker(model, variables)
        frames0, chunk, bboxes = synthetic_streams(args.streams, args.chunk)
        state = tracker.init(frames0, bboxes)
        out = None
        t0 = time.time()
        for _ in range(max(args.warmup, 1)):
            state, out = tracker.track(state, chunk)
        np.asarray(out["bbox"][-1])
        compile_s = time.time() - t0

        per_call = []
        for _ in range(args.repeats):
            t0 = time.time()
            for _ in range(args.timed):
                state, out = tracker.track(state, chunk)
            np.asarray(out["bbox"][-1])  # full device sync
            per_call.append((time.time() - t0) / args.timed)
        best = min(per_call)
        fps = args.streams * args.chunk / best
        print(json.dumps({
            "model": name,
            "weights": provenance,
            "streams": args.streams,
            "chunk": args.chunk,
            "ms_per_call_best": round(best * 1e3, 1),
            "fps_per_chip": round(fps, 0),
            "warmup_incl_compile_s": round(compile_s, 1),
        }), flush=True)

        del tracker, state, out, frames0, chunk, bboxes, variables, model
        gc.collect()


if __name__ == "__main__":
    main()
