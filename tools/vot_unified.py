"""Unified failure-handling study under the VOT supervised protocol
(VERDICT r4 #3): static vs EMA@1 dual-template vs zoom-out recovery vs
EMA+recovery, on the structural-appearance-change scenario suites, at the
pre-registered seed discipline.

The VOT supervised protocol (evaluate/vot_eval.py: re-init on failure,
burnin-masked accuracy, failure counting, segment EAO) is the protocol
DESIGNED for failure handling — this folds the previously separate AO-only
dual-template ablations and tools/vot_recovery.py into one table:
accuracy / robustness / EAO per scenario per config, with per-seed paired
deltas vs the static baseline (95% t-CI).

Ref protocol origin: got10k-toolkit ExperimentVOT semantics pulled in by
/root/reference/model_training/dataset/__init__.py:17-45.

    python tools/vot_unified.py --scenarios occlusion,pose,swap \
        --seeds 7,13,21,29,37 --frames 48 --platform cpu
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

# the four configurations under study; EMA hyperparameters are the
# measured-best appearance-morph settings (BENCHMARKS.md dual-template
# rounds), recovery the measured-best occlusion setting
CONFIGS = {
    "static": {},
    "ema1": dict(dynamic_template=True, update_threshold=0.85,
                 update_rate=0.2, update_interval=1),
    "recover": dict(recover_context=3.0, recover_threshold=0.7),
    "ema_recover": dict(dynamic_template=True, update_threshold=0.85,
                        update_rate=0.2, update_interval=1,
                        recover_context=3.0, recover_threshold=0.7),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenarios", default="occlusion,pose,swap")
    ap.add_argument("--drift", type=float, default=1.0,
                    help="appearance_drift for the 'drift' scenario")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--seeds", default="7,13,21,29,37")
    ap.add_argument("--skip", type=int, default=5)
    ap.add_argument("--burnin", type=int, default=10)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--root", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None, help="write JSONL rows here too")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.harness import build_scan_tracker
    from feartracker_tpu.evaluate.vot_eval import evaluate_vot
    from feartracker_tpu.tracker.tracker import FEARTracker

    work = args.root or tempfile.mkdtemp(prefix="vot_unified_")
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    config_names = args.configs.split(",")

    datasets = {}
    for scenario in scenarios:
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}")
            if not os.path.isdir(os.path.join(root, "got10k")):
                generate(root, tracks=1, frames=args.frames,
                         val_sequences=args.sequences, seed=seed,
                         appearance_drift=args.drift if scenario == "drift" else 0.0,
                         scenario=scenario)
            datasets[(scenario, seed)] = GOT10kDataset(
                os.path.join(root, "got10k"), subset="val")

    scan, prov = build_scan_tracker()
    sink = open(args.out, "w") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    rows = []
    for name in config_names:
        tracker = FEARTracker(scan.model, scan.variables, **CONFIGS[name])
        for (scenario, seed), ds in datasets.items():
            res = evaluate_vot(tracker, ds, skip=args.skip, burnin=args.burnin)
            row = {"scenario": scenario, "mode": name, "seed": seed,
                   "weights": prov}
            row.update({m: round(float(res[m]), 4) for m in METRICS})
            rows.append(row)
            emit(row)

    base = {(r["scenario"], r["seed"], m): r[m]
            for r in rows if r["mode"] == "static" for m in METRICS}
    for name in config_names:
        if name == "static":
            continue
        for scenario in scenarios:
            summary = {"summary": name, "scenario": scenario}
            for m in METRICS:
                vals = [r[m] for r in rows
                        if r["mode"] == name and r["scenario"] == scenario]
                deltas = [r[m] - base[(scenario, r["seed"], m)]
                          for r in rows
                          if r["mode"] == name and r["scenario"] == scenario]
                if not deltas:
                    continue
                summary[f"mean_{m}"] = round(float(sum(vals) / len(vals)), 4)
                mu, ci = mean_ci(deltas)
                summary[f"delta_{m}"] = round(mu, 4)
                summary[f"delta_{m}_ci95"] = (
                    round(ci, 4) if not math.isnan(ci) else None)
            summary["n_seeds"] = len(seeds)
            emit(summary)
    # static absolute means (the baseline row of the table)
    for scenario in scenarios:
        summary = {"summary": "static", "scenario": scenario}
        for m in METRICS:
            vals = [r[m] for r in rows
                    if r["mode"] == "static" and r["scenario"] == scenario]
            if vals:
                summary[f"mean_{m}"] = round(float(sum(vals) / len(vals)), 4)
        summary["n_seeds"] = len(seeds)
        emit(summary)
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
