"""Inference-time dual-template ablation: static vs dynamic template on
appearance-drift sequences.

The dynamic (dual) template update exists for appearance change the init
template cannot cover (the feature the reference announced but never
released — ref README.md:96, hook blocks.py:174-181). This measures what it
buys at inference: synthetic val sets at several appearance-drift levels
(object color morphs over the track), batched-evaluated with the scan
runtime, static vs EMA dual-template.

    python tools/dual_template_ablation.py --drifts 0,0.6,1.0 --frames 48
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drifts", default="0,0.6,1.0")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--update_threshold", type=float, default=0.85)
    ap.add_argument("--update_rate", type=float, default=0.2)
    ap.add_argument("--update_interval", type=int, default=4)
    ap.add_argument("--root", default=None, help="existing dataset root pattern (skips generation)")
    args = ap.parse_args()

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="dual_ablation_")
    for drift in [float(d) for d in args.drifts.split(",")]:
        root = os.path.join(work, f"drift{drift:g}")
        if not os.path.isdir(os.path.join(root, "got10k")):
            generate(root, tracks=1, frames=args.frames,
                     val_sequences=args.sequences, seed=7, appearance_drift=drift)
        ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
        for mode in ("static", "dual"):
            tracker, prov = build_scan_tracker(
                dynamic_template=(mode == "dual"),
                update_threshold=args.update_threshold,
                update_rate=args.update_rate,
                update_interval=args.update_interval,
            )
            res = batched_evaluate(tracker, ds, streams=args.sequences)
            print(json.dumps({
                "drift": drift, "mode": mode, "weights": prov,
                "ao": round(res["ao"], 4), "sr50": round(res["sr50"], 4),
                "sr75": round(res["sr75"], 4),
            }), flush=True)


if __name__ == "__main__":
    main()
