"""Family training evidence: do the framework-native fear_m / fear_l
scale-ups actually TRAIN, and does the XS→M warm start buy anything?

The reference ships exactly one trainable architecture, FEAR-XS (its paper
names FEAR-M/FEAR-L but the repo releases neither specs nor weights — ref:
README.md:28). The repo's family registry (models/fbnet.TRUNKS) claims the
scale-ups are drop-in across the training stack; this tool turns that claim
into a measured curve: identical budget / seed / hyperparameters / synthetic
tracking set, arms differing only in architecture (and, for the warm-start
arm, initialization via the non-strict transfer — convert/load.
transfer_variables, the analog of the reference's strict=False →
transfer_weights path, utils/torch.py:21-24).

Default arms:
  xs_scratch    — FEAR-XS random init (the anchor every other number ties to)
  m_scratch     — fear_m random init (does the widened trunk learn?)
  m_warmstart   — fear_m seeded from the recovered FEAR-XS weights (stem +
                  every width-matching leaf transfer; widened leaves at init)

All arms run in ONE process; per-epoch train loss + online-validation
box-IoU are printed as JSON rows, then a summary.

    python tools/family_train.py --epochs 6                  # real TPU
    python tools/family_train.py --platform cpu --smoke      # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pretrain_chain import tracker_config

ARCHS = {
    # name -> (model.name, towernum)
    "xs": ("fear_xs", 2),
    "m": ("fear_m", 2),
    "l": ("fear_l", 3),
}


def train_arm(label, arch, pretrained, root, platform, epochs, lr, batch,
              num_samples, seed):
    from feartracker_tpu.train.loop import Trainer

    model_name, towernum = ARCHS[arch]
    exp = tempfile.mkdtemp(prefix=f"family_{label}_")
    cfg = tracker_config(root, exp, platform, epochs, pretrained, lr, batch,
                         num_samples, seed)
    cfg["model"]["name"] = model_name
    cfg["model"]["towernum"] = towernum
    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.setup_state(0)
    history = []
    t0 = time.time()
    for epoch in range(epochs):
        tm = trainer.train_epoch(epoch)
        vm = trainer.validate(epoch)
        history.append({"arm": label, "epoch": epoch,
                        "loss": round(float(tm["loss"]), 4),
                        "val_box_iou": round(float(vm.get("box_iou", 0.0)), 4)})
        print(json.dumps(history[-1]), flush=True)
        trainer.train_dataset.resample()
    print(json.dumps({"arm": label, "wall_s": round(time.time() - t0, 1)}),
          flush=True)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="", help='"" = default backend (TPU)')
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_samples", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tracks", type=int, default=24)
    ap.add_argument("--track_frames", type=int, default=16)
    ap.add_argument("--arms", default="xs_scratch,m_scratch,m_warmstart",
                    help="comma list from: xs_scratch, m_scratch, m_warmstart, "
                    "l_scratch, l_warmstart")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny budget for a CPU smoke run")
    args = ap.parse_args()

    if args.smoke:
        args.epochs, args.batch, args.num_samples = 1, 4, 8
        args.tracks, args.track_frames = 4, 6

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from feartracker_tpu.convert.load import PACKAGED_FEAR_XS
    from tools.make_synthetic_dataset import generate

    # shared tracking dataset (same generator settings as the pretrain chain)
    root = tempfile.mkdtemp(prefix="family_track_")
    generate(root, tracks=args.tracks, frames=args.track_frames,
             val_sequences=4, seed=11, size=(288, 384), obj_scale=1.5)

    results = {}
    for label in args.arms.split(","):
        arch, init = label.split("_", 1)
        if arch not in ARCHS:
            raise SystemExit(f"unknown arch in arm {label!r}")
        pretrained = PACKAGED_FEAR_XS if init == "warmstart" else None
        results[label] = train_arm(label, arch, pretrained, root,
                                   args.platform, args.epochs, args.lr,
                                   args.batch, args.num_samples, args.seed)

    summary = {
        arm: {"best_val_box_iou": max(h["val_box_iou"] for h in hist),
              "final_val_box_iou": hist[-1]["val_box_iou"],
              "final_loss": hist[-1]["loss"]}
        for arm, hist in results.items()
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
