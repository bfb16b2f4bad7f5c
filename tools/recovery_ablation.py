"""Zoom-out re-acquisition ablation: does widening the search window after a
low-confidence frame recover lost targets?

The reference's only failure response is a host-side re-init from the UI
(ref: VOTracker.swift:84-86, FEARTrackingViewController.swift:98-103). The
scan runtime's in-graph alternative (`ScanTracker(recover_context=...)`)
widens the NEXT search crop for any stream whose confidence fell below
``recover_threshold`` — same 256² output, wider source window, zero host
involvement. The motivating regime is occlusion: the round-4 signal probe
showed confidence dips below 0.31 during the occlusion episode, and the
target often exits the (context-2) search window before confidence returns.

Protocol mirrors tools/dual_template_ablation.py: static-template trackers
differing only in recovery config, evaluated per scenario × pre-registered
seed, paired per-seed AO deltas vs the no-recovery baseline, 95% t-CI.

    python tools/recovery_ablation.py --scenarios occlusion,swap,pose,drift \
        --contexts 3,4 --seeds 7,13,21,29,37 --frames 48
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dual_template_ablation import mean_ci


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="occlusion,swap,pose,drift")
    ap.add_argument("--drift", type=float, default=1.0)
    ap.add_argument("--contexts", default="3,4",
                    help="comma list of recover_context values (0 = baseline, "
                    "always included)")
    ap.add_argument("--recover_threshold", type=float, default=0.7)
    ap.add_argument("--with_dual", action="store_true",
                    help="add ema@1 and ema@1+recovery arms (the production-"
                    "composition question)")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--seeds", default="7,13,21,29,37")
    ap.add_argument("--root", default=None, help="existing dataset root pattern")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="recovery_ablation_")
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    contexts = [float(c) for c in args.contexts.split(",") if float(c) > 0]

    datasets = {}
    for scenario in scenarios:
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}")
            if not os.path.isdir(os.path.join(root, "got10k")):
                generate(root, tracks=1, frames=args.frames,
                         val_sequences=args.sequences, seed=seed,
                         appearance_drift=args.drift if scenario == "drift" else 0.0,
                         scenario=scenario)
            datasets[(scenario, seed)] = GOT10kDataset(os.path.join(root, "got10k"), subset="val")

    # arms: baseline + each recovery context, and (with --with_dual) the
    # production-composition question — does EMA@1 (the distractor-churn
    # recommendation) compose with zoom-out recovery (the occlusion
    # recommendation), or do they interact (e.g. a template refresh taken
    # from a recovered wide crop)?
    arms = [("baseline", {})]
    for ctx in contexts:
        arms.append((f"recover_c{ctx:g}",
                     dict(recover_context=ctx, recover_threshold=args.recover_threshold)))
    if args.with_dual:
        dual = dict(dynamic_template=True, update_mode="ema", update_interval=1)
        arms.append(("ema1", dict(dual)))
        for ctx in contexts:
            arms.append((f"ema1+recover_c{ctx:g}",
                         dict(dual, recover_context=ctx,
                              recover_threshold=args.recover_threshold)))

    rows = []
    for label, kw in arms:
        ctx = kw.get("recover_context", 0.0)
        tracker, prov = build_scan_tracker(**kw)
        for (scenario, seed), ds in datasets.items():
            res = batched_evaluate(tracker, ds, streams=args.sequences)
            row = {"scenario": scenario, "mode": label, "seed": seed,
                   "context": ctx, "threshold": args.recover_threshold,
                   "weights": prov,
                   "ao": round(res["ao"], 4), "sr50": round(res["sr50"], 4),
                   "sr75": round(res["sr75"], 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    base = {(r["scenario"], r["seed"]): r["ao"] for r in rows if r["mode"] == "baseline"}
    print("\n== pooled AO deltas vs baseline (per-seed paired, 95% t-CI) ==")
    for mode in sorted({r["mode"] for r in rows} - {"baseline"}):
        for scenario in scenarios:
            deltas = [r["ao"] - base[(scenario, r["seed"])]
                      for r in rows if r["mode"] == mode and r["scenario"] == scenario]
            if not deltas:
                continue
            m, ci = mean_ci(deltas)
            pos = sum(d > 0 for d in deltas)
            print(json.dumps({
                "summary": mode, "scenario": scenario, "n_seeds": len(deltas),
                "delta_ao_mean": round(m, 4),
                "delta_ao_ci95": round(ci, 4) if not math.isnan(ci) else None,
                "positive_seeds": f"{pos}/{len(deltas)}",
            }), flush=True)


if __name__ == "__main__":
    main()
