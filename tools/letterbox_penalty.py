"""Measure the batched-eval letterbox resolution penalty (VERDICT r3 #4).

`evaluate/batched_eval.py` letterboxes every sequence into one canonical
canvas; sequences LARGER than the canvas are therefore tracked at reduced
resolution. Since `batched_evaluate` also drives in-training validation
(train/loop.py `val_batched`) and hence checkpoint ranking, that quality skew
must be a measured number, not a "typically within a point" claim.

Protocol: each scenario×seed scene is generated TWICE from the identical
random stream — once at the logical canvas size (`obj_scale=1`) and once at
``--scale``× resolution (`size·scale, obj_scale=scale`,
tools/make_synthetic_dataset.generate) — so the high-res dataset is the same
scene with ``scale``× the pixels. Three paths are scored on the high-res
sequences:

* ``sequential``  — FEARTracker frame-by-frame at FULL resolution (the
  reference's evaluation protocol: no letterbox, ref test.py:48-64);
* ``batched_fit`` — batched scan eval with a canvas that FITS the sequences
  (letterbox scale 1.0): isolates the batched-runtime effect;
* ``batched_lb``  — batched scan eval with the 1× canvas: the production
  letterboxed path, tracking at 1/scale resolution.

``batched_lb − batched_fit`` (paired per seed, pooled 95% t-CI) is the
letterbox penalty; ``batched_fit − sequential`` separates out the batched
-path effect (bf16 scan runtime vs f32 per-frame tracker).

    python tools/letterbox_penalty.py --scale 2 --scenarios drift,pose \
        --seeds 7,13,21 --frames 48 --sequences 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dual_template_ablation import mean_ci


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="drift,pose")
    ap.add_argument("--seeds", default="7,13,21")
    ap.add_argument("--scale", type=float, default=2.0,
                    help="sequence resolution as a multiple of the canvas")
    ap.add_argument("--canvas_h", type=int, default=360)
    ap.add_argument("--canvas_w", type=int, default=640)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--paths", default="sequential,batched_fit,batched_lb")
    ap.add_argument("--platform", default=None, help="force a jax platform (e.g. cpu)")
    ap.add_argument("--root", default=None, help="reuse an existing dataset root")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
    from feartracker_tpu.evaluate.harness import build_scan_tracker
    from feartracker_tpu.tracker.tracker import FEARTracker

    canvas = (args.canvas_h, args.canvas_w)
    big = (int(round(args.canvas_h * args.scale)), int(round(args.canvas_w * args.scale)))
    work = args.root or tempfile.mkdtemp(prefix="letterbox_")
    scenarios = args.scenarios.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    paths = args.paths.split(",")

    datasets = {}
    for scenario in scenarios:
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}_x{args.scale:g}")
            if not os.path.isdir(os.path.join(root, "got10k")):
                generate(root, tracks=1, frames=args.frames,
                         val_sequences=args.sequences, seed=seed,
                         size=big, obj_scale=args.scale,
                         appearance_drift=1.0 if scenario == "drift" else 0.0,
                         scenario=scenario)
            datasets[(scenario, seed)] = GOT10kDataset(os.path.join(root, "got10k"), subset="val")

    scan_tracker, prov = build_scan_tracker()
    seq_tracker = FEARTracker(scan_tracker.model, scan_tracker.variables)

    rows = []
    for (scenario, seed), ds in sorted(datasets.items()):
        for path in paths:
            if path == "sequential":
                res = evaluate_tracker(seq_tracker, ds)
            elif path == "batched_fit":
                res = batched_evaluate(scan_tracker, ds, streams=args.sequences, frame_hw=big)
            elif path == "batched_lb":
                res = batched_evaluate(scan_tracker, ds, streams=args.sequences, frame_hw=canvas)
            else:
                raise SystemExit(f"unknown path {path!r}")
            row = {
                "scenario": scenario, "seed": seed, "path": path,
                "canvas": list(canvas if path == "batched_lb" else big),
                "weights": prov, "scale": args.scale,
                "ao": round(res["ao"], 4), "sr50": round(res["sr50"], 4),
                "sr75": round(res["sr75"], 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    by = {(r["scenario"], r["seed"], r["path"]): r["ao"] for r in rows}
    print("\n== pooled paired AO deltas (95% t-CI) ==")
    for name, a, b in (("letterbox_penalty", "batched_lb", "batched_fit"),
                       ("batched_vs_sequential", "batched_fit", "sequential")):
        for scenario in scenarios:
            deltas = [
                by[(scenario, s, a)] - by[(scenario, s, b)]
                for s in seeds
                if (scenario, s, a) in by and (scenario, s, b) in by
            ]
            if not deltas:
                continue
            m, ci = mean_ci(deltas)
            print(json.dumps({
                "summary": name, "scenario": scenario, "n_seeds": len(deltas),
                "delta_ao_mean": round(m, 4),
                "delta_ao_ci95": None if ci != ci else round(ci, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
