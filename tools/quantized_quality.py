"""Quality-evaluate the bf16 quantized deployment export (VERDICT r3 #3).

The reference's DEPLOYED model is its FP16-quantized CoreML pair
(ref: evaluate/coreml_utils.py:54-58) — quantization there is a shipping
decision backed by a working demo app, not a tolerance check. This tool puts
the repo's analog (the ``*_quantized.stablehlo`` bf16 pair,
convert/export.py) through actual tracking and reports quality numbers:

1. **Trajectory divergence** on the reference demo video: the fp32 exported
   pair vs the quantized pair, both driven through the production
   crop/postprocess path (convert/export.ExportedTracker). Per-frame center
   distance (px) and box IoU between the two trajectories — mean/median/
   p95/max — plus the same for the in-process f32 tracker vs the fp32
   export (the serialization sanity delta).
2. **ΔAO on the synthetic suite**: sequential GOT-10k-protocol evaluation of
   both exported pairs over scenario × seed datasets; paired per-seed AO
   deltas pooled with a 95% t-CI.

    python tools/quantized_quality.py --frames 120 --scenarios drift,pose \
        --seeds 7,13,21 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.dual_template_ablation import mean_ci

DEMO_VIDEO = "/root/reference/assets/test.mp4"
DEMO_BBOX = np.array([163.0, 53.0, 45.0, 174.0])


def trajectory(tracker, frames, init_bbox):
    tracker.initialize(frames[0], np.asarray(init_bbox, np.float64))
    boxes = [np.asarray(init_bbox, np.float64)]
    for f in frames[1:]:
        boxes.append(np.asarray(tracker.update(f)["bbox"], np.float64))
    return np.stack(boxes)


def divergence(a, b):
    """Per-frame center distance (px) + IoU stats between two trajectories."""
    from feartracker_tpu.core.geometry import overlap_xywh_np

    ca = a[:, :2] + a[:, 2:] / 2
    cb = b[:, :2] + b[:, 2:] / 2
    dist = np.linalg.norm(ca - cb, axis=1)
    iou = overlap_xywh_np(a, b)
    return {
        "center_px_mean": round(float(dist.mean()), 3),
        "center_px_median": round(float(np.median(dist)), 3),
        "center_px_p95": round(float(np.percentile(dist, 95)), 3),
        "center_px_max": round(float(dist.max()), 3),
        "iou_mean": round(float(iou.mean()), 4),
        "iou_min": round(float(iou.min()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export_dir", default=None, help="reuse an existing export dir")
    ap.add_argument("--video", default=DEMO_VIDEO)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--scenarios", default="drift,pose")
    ap.add_argument("--seeds", default="7,13,21")
    ap.add_argument("--seq_frames", type=int, default=24)
    ap.add_argument("--sequences", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.convert.export import ExportedTracker, export_tracker
    from feartracker_tpu.convert.load import default_weights_path, load_variables
    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.tracker import FEARTracker
    from feartracker_tpu.utils.video import read_video

    model = FEARNet()
    variables = load_variables(default_weights_path())
    out_dir = args.export_dir or tempfile.mkdtemp(prefix="export_quality_")
    if not os.path.isfile(os.path.join(out_dir, "tracker_quantized.stablehlo")):
        export_tracker(model, variables, out_dir)
    def pair(sfx):
        return ExportedTracker(
            os.path.join(out_dir, f"tracker_init{sfx}.stablehlo"),
            os.path.join(out_dir, f"tracker{sfx}.stablehlo"),
        )

    fp32, quant = pair(""), pair("_quantized")

    # 1. trajectory divergence on the demo video
    if os.path.isfile(args.video):
        frames = read_video(args.video, max_frames=args.frames)
        t_proc = trajectory(FEARTracker(model, variables), frames, DEMO_BBOX)
        t_fp32 = trajectory(fp32, frames, DEMO_BBOX)
        t_quant = trajectory(quant, frames, DEMO_BBOX)
        print(json.dumps({"divergence": "quantized_vs_fp32_export",
                          "frames": len(frames), **divergence(t_quant, t_fp32)}), flush=True)
        print(json.dumps({"divergence": "fp32_export_vs_inprocess",
                          "frames": len(frames), **divergence(t_fp32, t_proc)}), flush=True)
    else:
        print(json.dumps({"divergence": "skipped", "reason": f"{args.video} missing"}),
              flush=True)

    # 2. ΔAO on the synthetic suite (sequential GOT-10k protocol)
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    work = tempfile.mkdtemp(prefix="quant_ao_")
    deltas_all = {}
    for scenario in scenarios:
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}")
            generate(root, tracks=1, frames=args.seq_frames,
                     val_sequences=args.sequences, seed=seed,
                     appearance_drift=1.0 if scenario == "drift" else 0.0,
                     scenario=scenario)
            ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
            ao = {}
            for name, tr in (("fp32_export", fp32), ("quantized_export", quant)):
                res = evaluate_tracker(tr, ds)
                ao[name] = res["ao"]
                print(json.dumps({"scenario": scenario, "seed": seed, "path": name,
                                  "ao": round(res["ao"], 4),
                                  "sr50": round(res["sr50"], 4)}), flush=True)
            deltas_all.setdefault(scenario, []).append(
                ao["quantized_export"] - ao["fp32_export"])

    print("\n== quantized − fp32 AO (paired per seed, 95% t-CI) ==")
    for scenario, deltas in deltas_all.items():
        m, ci = mean_ci(deltas)
        print(json.dumps({"summary": "quantized_delta_ao", "scenario": scenario,
                          "n_seeds": len(deltas), "delta_ao_mean": round(m, 4),
                          "delta_ao_ci95": None if ci != ci else round(ci, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
