"""The family Pareto table (VERDICT r4 #2 deliverable): quality × speed for
every zoo artifact, measured — the dial the reference's paper promises
(FEAR-XS/M/L, /root/reference/README.md:28) but its repo never ships.

Quality: batched AO over the pre-registered mixed structural suite
(swap / pose / occlusion / drift@1.0, seeds 7,13,21,29,37 — the same
datasets as every prior ablation), pooled per-seed mean ± 95% t-CI of the
mixed-suite AO (mean over scenarios per seed).

Speed: tracked FPS/chip from tools/family_bench.py's protocol (run that on
the real chip and pass the numbers via --fps, or leave them out — the table
then carries quality only).

    python tools/family_pareto.py --platform cpu \
        --entries fear_xs:fear_xs,fear_xs_repo:fear_xs,fear_m_repo:fear_m,fear_l_repo:fear_l \
        --fps fear_xs=22339,fear_m=13600,fear_l=9800
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
from tools.gate_v2_ablation import SCENARIOS, SEEDS

TOWERNUM = {"fear_xs": 2, "fear_m": 2, "fear_l": 3}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--entries",
                    default="fear_xs:fear_xs,fear_xs_repo:fear_xs,"
                            "fear_m_repo:fear_m,fear_l_repo:fear_l",
                    help="comma list of <weights>:<model_name>; <weights> is "
                    "a zoo name or npz path")
    ap.add_argument("--fps", default="",
                    help="comma list of <model_name>=<fps> (measured on chip "
                    "by tools/family_bench.py) to join into the table")
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--seeds", default=",".join(map(str, SEEDS)))
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--drift", type=float, default=1.0)
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

    work = args.root or tempfile.mkdtemp(prefix="pareto_")
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    fps = {}
    for kv in filter(None, args.fps.split(",")):
        k, v = kv.split("=")
        fps[k] = float(v)

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

    sink = open(args.out, "w") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    for entry in args.entries.split(","):
        weights, model_name = entry.split(":")
        try:
            tracker, prov = build_scan_tracker(
                weights_path=weights, model_name=model_name,
                towernum=TOWERNUM.get(model_name, 2))
        except Exception as e:
            emit({"entry": weights, "skipped": f"{type(e).__name__}: {e}"})
            continue
        if prov == "random":
            emit({"entry": weights, "skipped": "weights not found (random "
                  "init would be a meaningless quality number)"})
            continue
        per_seed_mixed, per_scenario = [], {s: [] for s in scenarios}
        for seed in seeds:
            aos = []
            for scenario in scenarios:
                res = batched_evaluate(tracker, datasets[(scenario, seed)],
                                       streams=args.sequences)
                aos.append(res["ao"])
                per_scenario[scenario].append(res["ao"])
            per_seed_mixed.append(sum(aos) / len(aos))
        m, ci = mean_ci(per_seed_mixed)
        emit({
            "entry": weights, "model": model_name, "weights": prov,
            "mixed_ao": round(m, 4),
            "mixed_ao_ci95": round(ci, 4) if not math.isnan(ci) else None,
            **{f"ao_{s}": round(sum(v) / len(v), 4)
               for s, v in per_scenario.items()},
            **({"fps_chip": fps[model_name]} if model_name in fps else {}),
        })
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
