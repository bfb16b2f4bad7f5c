"""Pre-registered gate v2 evaluation (VERDICT r4 #4 decision experiment).

Compares, on the mixed structural-appearance suite (swap / pose / occlusion /
drift@1.0 — the same generator, sequence counts, frame counts and
pre-registered seeds 7,13,21,29,37 as every prior dual-template ablation):

* ``static``  — init template only (reference shipped config, the floor);
* ``ema1``    — always-EMA@1: confidence-gated EMA, threshold 0.85, rate 0.2,
  interval 1 (the measured-best production config, BENCHMARKS.md);
* ``feature`` — gate v2: the learned feature-conditioned per-frame rate
  (models/gate.py, trained by tools/train_feature_gate.py on disjoint seeds),
  same max rate 0.2, no hard threshold.

DECISION RULE (pre-registered): gate v2 replaces ema1 as the production
update policy iff its per-seed MIXED-SUITE AO delta vs ema1 (mean over the
four scenarios, paired per seed) is positive with the 95% t-CI excluding
zero. Otherwise the negative is recorded and the gating design space is
closed (the scalar gate, four single-signal gates, and the multi-feature
gate will then all be measured negatives).

    python tools/gate_v2_ablation.py --platform cpu \
        --gate_npz feartracker_tpu/weights/fear_xs_feature_gate.npz
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

SCENARIOS = ("swap", "pose", "occlusion", "drift")
SEEDS = (7, 13, 21, 29, 37)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gate_npz", default="feartracker_tpu/weights/fear_xs_feature_gate.npz")
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--seeds", default=",".join(map(str, SEEDS)))
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--drift", type=float, default=1.0)
    ap.add_argument("--update_rate", type=float, default=0.2)
    ap.add_argument("--modes", default="static,ema1,feature")
    ap.add_argument("--root", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="gate_v2_eval_")
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    modes = args.modes.split(",")

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

    MODE_KW = {
        "static": {},
        "ema1": dict(dynamic_template=True, update_mode="ema",
                     update_threshold=0.85, update_rate=args.update_rate,
                     update_interval=1),
        "feature": dict(dynamic_template=True, update_mode="feature",
                        update_rate=args.update_rate, gate_params=args.gate_npz),
    }

    sink = open(args.out, "w") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    rows = []
    for mode in modes:
        tracker, prov = build_scan_tracker(**MODE_KW[mode])
        for (scenario, seed), ds in datasets.items():
            res = batched_evaluate(tracker, ds, streams=args.sequences)
            row = {"scenario": scenario, "mode": mode, "seed": seed,
                   "weights": prov, "ao": round(res["ao"], 4),
                   "sr50": round(res["sr50"], 4)}
            rows.append(row)
            emit(row)

    def ao(mode, scenario, seed):
        for r in rows:
            if r["mode"] == mode and r["scenario"] == scenario and r["seed"] == seed:
                return r["ao"]
        return None

    # per-scenario paired deltas + the DECISION metric: mixed-suite delta
    for target, base in (("feature", "ema1"), ("feature", "static"),
                         ("ema1", "static")):
        if target not in modes or base not in modes:
            continue
        mixed_deltas = []
        for seed in seeds:
            ds_ = [ao(target, s, seed) - ao(base, s, seed) for s in scenarios]
            mixed_deltas.append(sum(ds_) / len(ds_))
        for scenario in scenarios:
            deltas = [ao(target, scenario, seed) - ao(base, scenario, seed)
                      for seed in seeds]
            m, ci = mean_ci(deltas)
            emit({"summary": f"{target}_vs_{base}", "scenario": scenario,
                  "delta_ao": round(m, 4),
                  "ci95": round(ci, 4) if not math.isnan(ci) else None,
                  "positive_seeds": f"{sum(d > 0 for d in deltas)}/{len(deltas)}"})
        m, ci = mean_ci(mixed_deltas)
        decision = None
        if target == "feature" and base == "ema1":
            decision = ("SHIP gate v2" if (m - ci) > 0
                        else "NEGATIVE: keep ema1, close the gating design space")
        emit({"summary": f"{target}_vs_{base}", "scenario": "MIXED",
              "delta_ao": round(m, 4),
              "ci95": round(ci, 4) if not math.isnan(ci) else None,
              "positive_seeds": f"{sum(d > 0 for d in mixed_deltas)}/{len(mixed_deltas)}",
              **({"decision": decision} if decision else {})})
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
