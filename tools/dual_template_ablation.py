"""Inference-time dual-template ablation: static vs EMA vs gated template on
appearance-change regimes.

The dynamic (dual) template update exists for appearance change the init
template cannot cover (the feature the reference announced but never
released — ref README.md:96, hook blocks.py:174-181). This measures what it
buys at inference on four synthetic regimes (tools/make_synthetic_dataset.py):

* ``drift``     — gradual color morph (easy; template stays roughly valid);
* ``pose``      — out-of-plane rotation with foreshortening + shading —
  by mid-track the appearance is structurally unlike the init template;
* ``occlusion`` — occluder bars sweep over the target; a blind (EMA)
  update can absorb the occluder, a confidence-gated one should not;
* ``swap``      — a same-appearance distractor crosses the target's path.

Each regime is batch-evaluated with the scan runtime under: static template,
EMA dual-template, gated (trained sigmoid(template_gate)) dual-template, at
one or more update intervals.

    python tools/dual_template_ablation.py --scenarios drift,pose,occlusion,swap \
        --modes static,ema,gated --intervals 4 --frames 48
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
    ap.add_argument("--scenarios", default="drift,pose,occlusion,swap")
    ap.add_argument("--drift", type=float, default=1.0,
                    help="appearance_drift level used for the 'drift' scenario")
    ap.add_argument("--modes", default="static,ema,gated")
    ap.add_argument("--intervals", default="4")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--update_threshold", type=float, default=0.85)
    ap.add_argument("--update_rate", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=7, help="dataset generator seed")
    ap.add_argument("--root", default=None, help="existing dataset root pattern (skips generation)")
    args = ap.parse_args()

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="dual_ablation_")
    intervals = [int(i) for i in args.intervals.split(",")]
    for scenario in args.scenarios.split(","):
        root = os.path.join(work, f"{scenario}_s{args.seed}")
        if not os.path.isdir(os.path.join(root, "got10k")):
            generate(root, tracks=1, frames=args.frames,
                     val_sequences=args.sequences, seed=args.seed,
                     appearance_drift=args.drift if scenario == "drift" else 0.0,
                     scenario=scenario)
        ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
        for mode in args.modes.split(","):
            for interval in intervals if mode != "static" else [0]:
                kw = {}
                if mode != "static":
                    kw = dict(
                        dynamic_template=True,
                        update_mode=mode,
                        update_threshold=args.update_threshold,
                        update_rate=args.update_rate,
                        update_interval=interval,
                    )
                tracker, prov = build_scan_tracker(**kw)
                res = batched_evaluate(tracker, ds, streams=args.sequences)
                print(json.dumps({
                    "scenario": scenario, "mode": mode, "seed": args.seed,
                    "interval": interval, "weights": prov,
                    "ao": round(res["ao"], 4), "sr50": round(res["sr50"], 4),
                    "sr75": round(res["sr75"], 4),
                }), flush=True)


if __name__ == "__main__":
    main()
