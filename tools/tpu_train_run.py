"""Full-geometry FEAR-XS training on the REAL TPU: fine-tune from the
recovered CoreML weights on synthetic data, exercising the whole L6 stack on
the target hardware — Trainer.fit() with checkpoints, plateau LR, online
tracking validation, then a resume-from-last continuation with a step-id
continuity check (VERDICT.md round-1 item #5).

    python tools/make_synthetic_dataset.py --root /tmp/synth_xl --tracks 24 \
        --frames 16 --val_sequences 4 --height 288 --width 384
    python tools/tpu_train_run.py --root /tmp/synth_xl --exp /tmp/tpu_exp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"


def build_config(root: str, exp: str, platform: str, epochs: int, resume: bool,
                 dual_template: bool = False, device_augs: bool = False):
    return {
        "dual_template": dual_template,
        "device_augs": device_augs,
        # platform "" = default backend (the tunneled TPU); tests use "cpu"
        "platform": platform,
        "num_devices": 1,
        "sync_bn": False,
        "precision": "bfloat16",
        "seed": 0,
        "model": {
            "name": "fear_xs",
            "adjust_channels": 256,
            "towernum": 2,
            "pretrained_weights": TRACKER_ML,
        },
        "tracker": {
            "score_size": 16, "total_stride": 16, "instance_size": 256,
            "template_size": 128, "penalty_k": 0.062, "window_influence": 0.38,
            "lr": 0.765, "template_bbox_offset": 0.2, "search_context": 2,
        },
        "optimizer": {"name": "adam", "lr": 1e-4},
        "scheduler": {"mode": "max", "patience": 1, "factor": 0.5},
        "loss": {"coeffs": {"TARGET_CLASSIFICATION_KEY": 1, "TARGET_REGRESSION_LABEL_KEY": 1}},
        "batch_size": {"train": 32, "val": 1},
        "num_workers": 2,
        "max_epochs": epochs,
        "min_epochs": 1,
        "early_stopping": 50,
        "metric_mode": "max",
        "max_val_samples": 12,
        "log_every_n_steps": 4,
        "save_top_k": 2,
        "sanity_steps": 1,
        "check_val_every_n_epoch": 1,
        "resume": resume,
        "experiment": {"folder": exp, "name": "TPU_XS"},
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
                "num_samples": 256, "clip_range": True,
            },
        }]},
        "val": {"datasets": [{"name": "got10k", "root_dir": f"{root}/got10k", "subset": "val"}]},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_xl")
    ap.add_argument("--exp", default="/tmp/tpu_exp")
    ap.add_argument("--platform", default="", help='"" = TPU, "cpu" for smoke runs')
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--resume_epochs", type=int, default=2,
                    help="extra epochs for the resumed run (0 = skip resume check)")
    ap.add_argument("--dual", action="store_true",
                    help="train the dual-template module (BASELINE config 3)")
    ap.add_argument("--device_augs", action="store_true",
                    help="staged loader + on-device augmentation in the train step")
    ap.add_argument("--resume", action="store_true",
                    help="resume the FIRST run from the experiment's last "
                    "checkpoint (crash-recovery drill: kill -9 a prior run "
                    "mid-training, rerun with --resume, and the epoch/step "
                    "counters continue from the last completed save)")
    args = ap.parse_args()

    from feartracker_tpu.train.loop import Trainer

    t0 = time.time()
    trainer = Trainer(build_config(args.root, args.exp, args.platform, args.epochs,
                               args.resume,
                               dual_template=args.dual, device_augs=args.device_augs))
    trainer.setup_data()
    trainer.setup_state(0)

    # per-epoch curves via the epoch hooks: wrap train_epoch/validate
    curves = []
    orig_train_epoch, orig_validate = trainer.train_epoch, trainer.validate

    def train_epoch(epoch):
        te0 = time.time()
        m = orig_train_epoch(epoch)
        m["epoch_s"] = round(time.time() - te0, 1)
        curves.append({"epoch": epoch, **{k: round(float(v), 4) for k, v in m.items()}})
        return m

    def validate(epoch):
        v = orig_validate(epoch)
        if curves and epoch >= 0:
            curves[-1].update({f"val_{k}": round(float(x), 4) for k, x in v.items()})
        return v

    trainer.train_epoch, trainer.validate = train_epoch, validate
    trainer.fit()
    steps_first = int(trainer.state.step)
    print(f"\n== first run done: {steps_first} steps in {time.time()-t0:.0f}s ==")
    for c in curves:
        print(json.dumps(c))

    if args.resume_epochs:
        cfg = build_config(args.root, args.exp, args.platform,
                           args.epochs + args.resume_epochs, True,
                           dual_template=args.dual, device_augs=args.device_augs)
        resumed = Trainer(cfg)
        resumed.setup_data()
        resumed.setup_state(0)
        resumed.fit()
        steps_resumed = int(resumed.state.step)
        per_epoch = steps_first // args.epochs
        print(f"== resumed run: step {steps_first} -> {steps_resumed} "
              f"(expected +{args.resume_epochs * per_epoch}) ==")
        # continuity: epoch counter resumed, exactly resume_epochs more epochs
        assert steps_resumed == steps_first + args.resume_epochs * per_epoch, (
            steps_first, steps_resumed)
        print("resume continuity OK")


if __name__ == "__main__":
    main()
