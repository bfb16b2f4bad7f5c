"""Inference-time dual-template ablation: static vs EMA vs gated template on
appearance-change regimes, over multiple dataset seeds with pooled statistics.

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

Modes:

* ``static``        — init template only (the reference's shipped config);
* ``ema``           — confidence-gated EMA blend of the dynamic template;
* ``gated``         — learned-interpolation blend using sigmoid(template_gate)
  from the DEFAULT weights. Recovered FEAR-XS checkpoints zero-fill that
  parameter (convert/fear_weights.py), so this is the UNTRAINED 0.5 blend —
  reported as ``gated_0.5``;
* ``gated_trained`` — same graph, weights from ``--gate_npz`` (produced by
  tools/train_template_gate.py: FEAR-XS with only the gate trained), i.e.
  the blend actually uses a LEARNED interpolation weight.

Each (mode, interval) tracker is built once and evaluated over every
scenario × seed dataset (the jit caches live per tracker instance — this
ordering pays each distinct scan graph's compile exactly once). Per-run rows
stream as JSON; a final summary pools per-seed AO deltas vs static with a
95% t-CI.

    python tools/dual_template_ablation.py --scenarios swap,occlusion,pose \
        --modes static,ema,gated,gated_trained --intervals 1,4 \
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

# two-sided 97.5% Student-t quantiles for n-1 degrees of freedom, n = 2..10
_T975 = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
         6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}


def mean_ci(xs):
    """(mean, half-width of the 95% CI) of a small sample (t-distribution)."""
    n = len(xs)
    m = sum(xs) / n
    if n < 2:
        return m, float("nan")
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    t = _T975.get(n - 1, 1.96)
    return m, t * math.sqrt(var / n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="drift,pose,occlusion,swap")
    ap.add_argument("--drift", type=float, default=1.0,
                    help="appearance_drift level used for the 'drift' scenario")
    ap.add_argument("--modes", default="static,ema,gated,gated_trained")
    ap.add_argument("--intervals", default="4")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--update_threshold", default="0.85",
                    help="confidence gate threshold; comma list sweeps it "
                    "(each value is a separate compiled tracker)")
    ap.add_argument("--update_rate", type=float, default=0.2)
    ap.add_argument("--seeds", default="7",
                    help="comma list of dataset generator seeds (pooled stats)")
    ap.add_argument("--gate_npz", default="feartracker_tpu/weights/fear_xs_gate.npz",
                    help="trained-gate weights for mode gated_trained "
                    "(tools/train_template_gate.py output)")
    ap.add_argument("--root", default=None, help="existing dataset root pattern (skips generation)")
    args = ap.parse_args()

    import numpy as np

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="dual_ablation_")
    intervals = [int(i) for i in args.intervals.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    modes = args.modes.split(",")

    # 1. all eval datasets up front (host-bound; one per scenario × seed)
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

    # 2. modes outer, datasets inner: one tracker (= one set of compiled scan
    # graphs) serves every dataset
    thresholds = [float(t) for t in str(args.update_threshold).split(",")]
    rows = []
    for mode in modes:
        for interval in intervals if mode != "static" else [0]:
            for thr in thresholds if mode != "static" else [thresholds[0]]:
                kw = {}
                if mode != "static":
                    kw = dict(
                        dynamic_template=True,
                        update_mode="gated" if mode.startswith("gated") else mode,
                        update_threshold=thr,
                        update_rate=args.update_rate,
                        update_interval=max(interval, 1),
                    )
                if mode == "gated_trained":
                    tracker, prov = build_scan_tracker(weights_path=args.gate_npz, **kw)
                    prov = f"{prov}+trained_gate"
                else:
                    tracker, prov = build_scan_tracker(**kw)
                gate_val = None
                if mode.startswith("gated"):
                    import jax

                    gate_val = round(float(jax.nn.sigmoid(
                        np.asarray(tracker.variables["params"]["template_gate"])[0])), 4)
                label = "gated_0.5" if mode == "gated" else mode
                if len(thresholds) > 1 and mode != "static":
                    label = f"{label}_t{thr:g}"
                for (scenario, seed), ds in datasets.items():
                    res = batched_evaluate(tracker, ds, streams=args.sequences)
                    row = {
                        "scenario": scenario, "mode": label, "seed": seed,
                        "interval": interval, "threshold": None if mode == "static" else thr,
                        "weights": prov,
                        "gate": gate_val,
                        "ao": round(res["ao"], 4), "sr50": round(res["sr50"], 4),
                        "sr75": round(res["sr75"], 4),
                    }
                    rows.append(row)
                    print(json.dumps(row), flush=True)

    # 3. pooled per-seed deltas vs static, mean ± 95% CI
    static = {
        (r["scenario"], r["seed"]): r["ao"] for r in rows if r["mode"] == "static"
    }
    if static:
        print("\n== pooled AO deltas vs static (per-seed paired, 95% t-CI) ==")
        for mode in sorted({r["mode"] for r in rows} - {"static"}):
            for interval in sorted({r["interval"] for r in rows if r["mode"] == mode}):
                for scenario in scenarios:
                    deltas = [
                        r["ao"] - static[(scenario, r["seed"])]
                        for r in rows
                        if r["mode"] == mode and r["interval"] == interval
                        and r["scenario"] == scenario and (scenario, r["seed"]) in static
                    ]
                    if not deltas:
                        continue
                    m, ci = mean_ci(deltas)
                    pos = sum(d > 0 for d in deltas)
                    print(json.dumps({
                        "summary": f"{mode}@{interval}", "scenario": scenario,
                        "n_seeds": len(deltas),
                        "delta_ao_mean": round(m, 4),
                        "delta_ao_ci95": round(ci, 4) if not math.isnan(ci) else None,
                        "positive_seeds": f"{pos}/{len(deltas)}",
                    }), flush=True)


if __name__ == "__main__":
    main()
