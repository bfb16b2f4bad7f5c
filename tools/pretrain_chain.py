"""Prove the classification-pretrain → tracking-quality chain (VERDICT r3 #2).

The reference trains its tracker from an ImageNet-pretrained FBNet-C trunk
(ref: model_training/model/blocks.py:22-25, config/model/fear.yaml:5) — the
initialization is load-bearing for final quality. This tool demonstrates the
repo's re-expressed mechanism end-to-end at FULL FEAR-XS geometry
(256²/128², bf16):

1. classification-pretrain the FEAR-XS trunk (tools/pretrain_trunk.py) on a
   synthetic class-structured ImageFolder (tools/make_class_dataset.py);
2. train THREE trackers on the same synthetic tracking set at identical
   budget, seed, and hyperparameters, differing only in initialization:
   (a) ``scratch``     — random init;
   (b) ``cls_pretrain``— the classification-pretrained trunk prefix
       (npz → model.pretrained_weights → convert/load.transfer_variables);
   (c) ``recovered``   — the full recovered CoreML checkpoint (upper bound).
3. print per-epoch train loss / val online-tracking box-IoU curves and a
   three-way summary.

All three arms run in ONE process so the jitted train/val graphs compile
once. Optimizer is the same for every arm (adam, --lr) — the comparison is
initialization-only.

    python tools/pretrain_chain.py --epochs 12            # real TPU
    python tools/pretrain_chain.py --platform cpu --smoke # tiny CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"


def tracker_config(root, exp, platform, epochs, pretrained, lr, batch, num_samples, seed):
    return {
        "platform": platform,
        "num_devices": 1,
        "sync_bn": False,
        "precision": "bfloat16",
        "seed": seed,
        "model": {
            "name": "fear_xs", "adjust_channels": 256, "towernum": 2,
            **({"pretrained_weights": pretrained} if pretrained else {}),
        },
        "tracker": {
            "score_size": 16, "total_stride": 16, "instance_size": 256,
            "template_size": 128, "penalty_k": 0.062, "window_influence": 0.38,
            "lr": 0.765, "template_bbox_offset": 0.2, "search_context": 2,
        },
        "optimizer": {"name": "adam", "lr": lr},
        "scheduler": {"mode": "max", "patience": 2, "factor": 0.5},
        "loss": {"coeffs": {"TARGET_CLASSIFICATION_KEY": 1, "TARGET_REGRESSION_LABEL_KEY": 1}},
        "batch_size": {"train": batch, "val": 1},
        "num_workers": 2,
        "max_epochs": epochs,
        "early_stopping": epochs + 1,
        "metric_mode": "max",
        "max_val_samples": 8,
        "sanity_steps": 0,
        "log_every_n_steps": 50,
        "save_top_k": 0,
        "experiment": {"folder": exp, "name": "CHAIN"},
        "train": {"datasets": [{
            "name": "synthetic", "root": root,
            "sizes": {
                "search_image_size": 256, "template_image_size": 128,
                "search_context": 2, "template_bbox_offset": 0.2,
                "search_image_shift": 32, "search_image_scale": 0.2,
                "context_range": 1,
            },
            "regression_weight_label_size": 16,
            "sampling": {
                "type": "track", "data_path": f"{root}/train.csv",
                "negative_ratio": 0, "frame_offset": 8,
                "num_samples": num_samples, "clip_range": True,
            },
        }]},
        "val": {"datasets": [{"name": "got10k", "root_dir": f"{root}/got10k", "subset": "val"}]},
    }


def train_arm(name, pretrained, root, platform, epochs, lr, batch, num_samples, seed):
    from feartracker_tpu.train.loop import Trainer

    exp = tempfile.mkdtemp(prefix=f"chain_{name}_")
    trainer = Trainer(tracker_config(root, exp, platform, epochs, pretrained,
                                     lr, batch, num_samples, seed))
    trainer.setup_data()
    trainer.setup_state(0)
    history = []
    t0 = time.time()
    for epoch in range(epochs):
        tm = trainer.train_epoch(epoch)
        vm = trainer.validate(epoch)
        history.append({"arm": name, "epoch": epoch,
                        "loss": round(float(tm["loss"]), 4),
                        "val_box_iou": round(float(vm.get("box_iou", 0.0)), 4)})
        print(json.dumps(history[-1]), flush=True)
        trainer.train_dataset.resample()
    print(json.dumps({"arm": name, "wall_s": round(time.time() - t0, 1)}), flush=True)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="", help='"" = default backend (TPU)')
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_samples", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tracks", type=int, default=24)
    ap.add_argument("--track_frames", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=120)
    ap.add_argument("--pretrain_epochs", type=int, default=3)
    ap.add_argument("--pretrain_npz", default=None,
                    help="reuse an existing pretrained-trunk npz (skips step 1)")
    ap.add_argument("--arms", default="scratch,cls_pretrain,recovered")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes/budget for a CPU smoke run")
    args = ap.parse_args()

    if args.smoke:
        args.epochs, args.batch, args.num_samples = 1, 4, 8
        args.tracks, args.track_frames, args.per_class = 4, 6, 8
        args.pretrain_epochs = 1

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.make_class_dataset import generate_classes
    from tools.make_synthetic_dataset import generate
    from tools.pretrain_trunk import train as pretrain

    # 1. classification pretraining (or reuse)
    npz = args.pretrain_npz
    if npz is None:
        cls_root = tempfile.mkdtemp(prefix="chain_cls_")
        generate_classes(cls_root, per_class=args.per_class, seed=args.seed)
        npz = os.path.join(tempfile.mkdtemp(prefix="chain_npz_"), "fear_xs_trunk.npz")
        rec = pretrain(cls_root, "fear_xs", npz, epochs=args.pretrain_epochs,
                       batch_size=args.batch, image_size=128, seed=args.seed)
        print(json.dumps({"pretrain_final": rec["history"][-1],
                          "arrays": rec["arrays"]}), flush=True)

    # 2. shared tracking dataset
    root = tempfile.mkdtemp(prefix="chain_track_")
    generate(root, tracks=args.tracks, frames=args.track_frames,
             val_sequences=4, seed=11, size=(288, 384), obj_scale=1.5)

    # 3. three arms, identical budget/seed/hparams
    inits = {"scratch": None, "cls_pretrain": npz, "recovered": TRACKER_ML}
    results = {}
    for arm in args.arms.split(","):
        results[arm] = train_arm(arm, inits[arm], root, args.platform, args.epochs,
                                 args.lr, args.batch, args.num_samples, args.seed)

    summary = {
        arm: {"best_val_box_iou": max(h["val_box_iou"] for h in hist),
              "final_val_box_iou": hist[-1]["val_box_iou"],
              "final_loss": hist[-1]["loss"]}
        for arm, hist in results.items()
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
