"""VOT supervised protocol with zoom-out re-acquisition: does in-graph
recovery reduce supervised failures (robustness) before the protocol's
host-side re-init has to fire?

The reference's only failure response IS the supervised re-init (host-side:
VOTracker.swift:84-86 throws, the UI re-initializes). The repo's
``recover_context`` widens the next search crop after any frame scoring
below ``recover_threshold`` — if that rescues the target before overlap
hits zero, the VOT supervised protocol records FEWER failures, which is
exactly what its robustness/EAO axes price in.

Protocol mirrors tools/recovery_ablation.py (same pre-registered seeds,
same synthetic scenario generator) but scores with the full VOT supervised
machinery (evaluate/vot_eval.py: burnin-masked accuracy, failure counting,
segment-based EAO) through the host FEARTracker — the sequential
reference-protocol path, not the batched scan.

    python tools/vot_recovery.py --scenarios occlusion --contexts 3 \
        --seeds 7,13,21,29,37 --frames 48
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

METRICS = ("accuracy", "robustness_failures", "failures_per_100f", "eao")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="occlusion")
    ap.add_argument("--drift", type=float, default=1.0)
    ap.add_argument("--contexts", default="3",
                    help="comma list of recover_context values (0 = baseline, "
                    "always included)")
    ap.add_argument("--recover_threshold", type=float, default=0.7)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--seeds", default="7,13,21,29,37")
    ap.add_argument("--skip", type=int, default=5)
    ap.add_argument("--burnin", type=int, default=10)
    ap.add_argument("--root", default=None, help="existing dataset root pattern")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.harness import build_scan_tracker
    from feartracker_tpu.evaluate.vot_eval import evaluate_vot
    from feartracker_tpu.tracker.tracker import FEARTracker

    work = args.root or tempfile.mkdtemp(prefix="vot_recovery_")
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

    # one weight load; a fresh host tracker per recovery config
    scan, prov = build_scan_tracker()
    rows = []
    for ctx in [0.0] + contexts:
        kw = {} if ctx == 0.0 else dict(
            recover_context=ctx, recover_threshold=args.recover_threshold)
        tracker = FEARTracker(scan.model, scan.variables, **kw)
        label = "baseline" if ctx == 0.0 else f"recover_c{ctx:g}"
        for (scenario, seed), ds in datasets.items():
            res = evaluate_vot(tracker, ds, skip=args.skip, burnin=args.burnin)
            row = {"scenario": scenario, "mode": label, "seed": seed,
                   "context": ctx, "threshold": args.recover_threshold,
                   "weights": prov}
            row.update({m: round(float(res[m]), 4) for m in METRICS})
            rows.append(row)
            print(json.dumps(row), flush=True)

    base = {(r["scenario"], r["seed"], m): r[m]
            for r in rows if r["mode"] == "baseline" for m in METRICS}
    print("\n== pooled deltas vs baseline (per-seed paired, 95% t-CI) ==")
    for mode in sorted({r["mode"] for r in rows} - {"baseline"}):
        for scenario in scenarios:
            summary = {"summary": mode, "scenario": scenario}
            for m in METRICS:
                deltas = [r[m] - base[(scenario, r["seed"], m)]
                          for r in rows
                          if r["mode"] == mode and r["scenario"] == scenario]
                if not deltas:
                    continue
                mu, ci = mean_ci(deltas)
                summary[f"delta_{m}"] = round(mu, 4)
                summary[f"delta_{m}_ci95"] = (
                    round(ci, 4) if not math.isnan(ci) else None)
            summary["n_seeds"] = len(seeds)
            print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
