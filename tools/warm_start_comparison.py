"""From-scratch vs partial-warm-start training comparison (VERDICT r2 #5).

Trains the SAME fear_tiny configuration twice on a synthetic dataset — once
from random init, once partially warm-started from the recovered FEAR-XS
checkpoint (only the shared trunk prefix transfers: stem + block0 depthwise;
see convert/load.transfer_variables) — and reports per-epoch val box_iou and
final train loss for both, as JSON lines.

    python tools/warm_start_comparison.py --epochs 4 --tracks 12 --frames 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _config(root, csv_path, exp, epochs, pretrained):
    model = {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1}
    if pretrained:
        model["pretrained_weights"] = pretrained
    return {
        "platform": "",
        "num_devices": 1,
        "sync_bn": False,
        "precision": "float32",
        "seed": 0,
        "model": model,
        "tracker": {
            "score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32,
            "penalty_k": 0.062, "window_influence": 0.38, "lr": 0.765,
            "template_bbox_offset": 0.2, "search_context": 2,
        },
        "optimizer": {"name": "adam", "lr": 1e-3},
        "scheduler": {"mode": "max", "patience": 5, "factor": 0.5},
        "batch_size": {"train": 8, "val": 1},
        "num_workers": 2,
        "max_epochs": epochs,
        "early_stopping": epochs + 1,
        "metric_mode": "max",
        "max_val_samples": 16,
        "sanity_steps": 0,
        "log_every_n_steps": 10,
        "save_top_k": 1,
        "experiment": {"folder": exp, "name": "CMP"},
        "train": {
            "datasets": [
                {
                    "name": "synthetic",
                    "root": root,
                    "sizes": {
                        "search_image_size": 64, "template_image_size": 32,
                        "search_context": 2, "template_bbox_offset": 0.2,
                        "search_image_shift": 8, "search_image_scale": 0.2,
                        "context_range": 1,
                    },
                    "regression_weight_label_size": 8,
                    "sampling": {
                        "type": "track", "data_path": csv_path, "negative_ratio": 0,
                        "frame_offset": 6, "num_samples": 64, "clip_range": True,
                    },
                }
            ]
        },
        "val": {"datasets": [{"name": "got10k", "root_dir": os.path.join(root, "got10k"), "subset": "val"}]},
    }


def run(init_name, pretrained, root, csv_path, epochs):
    from feartracker_tpu.train.loop import Trainer

    exp = tempfile.mkdtemp(prefix=f"warmcmp_{init_name}_")
    trainer = Trainer(_config(root, csv_path, exp, epochs, pretrained))
    trainer.setup_data()
    trainer.setup_state(0)
    history = []
    for epoch in range(epochs):
        tm = trainer.train_epoch(epoch)
        vm = trainer.validate(epoch)
        history.append({"epoch": epoch, "loss": round(tm["loss"], 4),
                        "val_box_iou": round(vm.get("box_iou", 0.0), 4)})
        print(json.dumps({"init": init_name, **history[-1]}), flush=True)
        trainer.train_dataset.resample()
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--tracks", type=int, default=12)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--val_sequences", type=int, default=4)
    args = ap.parse_args()

    from tools.make_synthetic_dataset import generate

    root = tempfile.mkdtemp(prefix="warmcmp_data_")
    csv_path = generate(root, tracks=args.tracks, frames=args.frames,
                        val_sequences=args.val_sequences, seed=11)

    scratch = run("scratch", None, root, csv_path, args.epochs)
    warm = run("partial_warm", "fear_xs", root, csv_path, args.epochs)
    print(json.dumps({
        "summary": {
            "final_val_box_iou": {"scratch": scratch[-1]["val_box_iou"],
                                  "partial_warm": warm[-1]["val_box_iou"]},
            "best_val_box_iou": {"scratch": max(h["val_box_iou"] for h in scratch),
                                 "partial_warm": max(h["val_box_iou"] for h in warm)},
        }
    }), flush=True)


if __name__ == "__main__":
    main()
