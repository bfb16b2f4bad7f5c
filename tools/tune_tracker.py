"""Decode-constant tuning: grid-search penalty_k / window_influence / lr.

The reference ships fixed decode constants (penalty_k 0.062,
window_influence 0.38, lr 0.765 — config/tracker/siam_tracker.yaml:2-5)
with no tooling to re-derive them for a new model or domain. This sweeps the
smooth-mode constants on any registry dataset and reports AO per point —
the missing half of the fine-tune → deploy workflow (docs/TRAINING.md).

    python tools/tune_tracker.py --dataset got10k --root /data/got10k \
        --subset val --batched --penalty_k 0.02,0.062,0.1 \
        --window 0.2,0.38,0.5 --lr 0.5,0.765,1.0

Sequential mode tracks one sequence at a time (host API);
``--batched`` letterboxes sequences through the multi-stream scan runtime
(one jit per grid point — the decode constants are trace-time constants).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _default_weights():
    from feartracker_tpu.convert.load import default_weights_path
    return default_weights_path()


def _floats(s: str):
    return [float(v) for v in s.split(",")]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights_path", default=None)
    ap.add_argument("--dataset", default="got10k")
    ap.add_argument("--root", required=True)
    ap.add_argument("--subset", default="val")
    ap.add_argument("--penalty_k", default="0.02,0.062,0.15")
    ap.add_argument("--window", default="0.2,0.38,0.5")
    ap.add_argument("--lr", default="0.765")
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--max_sequences", type=int, default=None)
    ap.add_argument("--platform", default="", help='e.g. "cpu"')
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.data.sequence import DATASET_REGISTRY
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig

    kwargs = {"subset": args.subset} if args.dataset in ("got10k", "trackingnet") else {}
    dataset = DATASET_REGISTRY[args.dataset](args.root, **kwargs)
    variables = load_variables(args.weights_path or _default_weights())

    best = None
    for pk in _floats(args.penalty_k):
        for wi in _floats(args.window):
            for lr in _floats(args.lr):
                cfg = TrackerConfig(smooth=True, penalty_k=pk, window_influence=wi, lr=lr)
                if args.batched:
                    import jax.numpy as jnp

                    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
                    from feartracker_tpu.tracker.runtime import ScanTracker

                    model = FEARNet(dtype=jnp.bfloat16)
                    tracker = ScanTracker(model, variables, cfg, dtype=jnp.bfloat16)
                    res = batched_evaluate(
                        tracker, dataset, streams=args.streams,
                        max_frames=args.max_frames, max_sequences=args.max_sequences,
                    )
                else:
                    from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
                    from feartracker_tpu.tracker.tracker import FEARTracker

                    tracker = FEARTracker(FEARNet(), variables, cfg)
                    res = evaluate_tracker(tracker, dataset, max_frames=args.max_frames)
                point = {
                    "penalty_k": pk, "window_influence": wi, "lr": lr,
                    "ao": res["ao"], "sr50": res["sr50"],
                    "num_sequences": res["num_sequences"],
                }
                print(json.dumps(point), flush=True)
                if best is None or point["ao"] > best["ao"]:
                    best = point
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
