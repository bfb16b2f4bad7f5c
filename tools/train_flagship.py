"""Train the framework's OWN flagship FEAR-XS checkpoint (VERDICT r4 #1).

Every quality artifact so far rides weights recovered from the reference's
CoreML exports; this run makes the training stack produce its own deployable
product, end-to-end on the real TPU:

1. build a mixed-scenario synthetic corpus — drift at three appearance-morph
   strengths, pose, swap, occlusion, at two resolutions, with distractors
   and presence==0 negative frames (the full structural-appearance-change
   space the round-3/4 ablations identified), plus a combined held-out val
   set (2 sequences per scenario);
2. classification-pretrain the FEAR-XS trunk (tools/pretrain_trunk.py) —
   the re-expressed analog of the reference's ImageNet FBNet-C warm start
   (ref: model_training/model/blocks.py:22-25, config/model/fear.yaml:5);
3. Trainer.fit() with the full L6 stack: bf16, plateau LR, dynamic
   frame-offset curriculum, per-epoch resampling, top-k Orbax selection on
   batched online-tracking validation over the held-out mixed suite;
4. restore the best checkpoint, export `weights/fear_xs_repo.npz`;
5. score it on the quality-gate protocol (sequential + batched letterboxed
   AO on the held-out drift suite, seed 3) side-by-side with the recovered
   reference checkpoint.

    python tools/train_flagship.py                     # full run, real TPU
    python tools/train_flagship.py --platform cpu --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, generator kwargs) — seeds disjoint from every committed fixture
SCENARIOS = [
    ("drift0", dict(scenario="drift", appearance_drift=0.0, size=(160, 224), obj_scale=1.0, seed=101)),
    ("drift5", dict(scenario="drift", appearance_drift=0.5, size=(288, 384), obj_scale=1.5, seed=102)),
    ("drift9", dict(scenario="drift", appearance_drift=0.9, size=(160, 224), obj_scale=1.0, seed=103)),
    ("pose", dict(scenario="pose", appearance_drift=0.0, size=(288, 384), obj_scale=1.5, seed=104)),
    ("swap", dict(scenario="swap", appearance_drift=0.3, size=(160, 224), obj_scale=1.0, seed=105)),
    ("occl", dict(scenario="occlusion", appearance_drift=0.3, size=(288, 384), obj_scale=1.5, seed=106)),
]


def build_corpus(root: str, tracks: int, frames: int, presence_dropout: float):
    """Generate per-scenario corpora + one combined held-out val root."""
    from tools.make_synthetic_dataset import generate

    val_root = os.path.join(root, "val_all", "val")
    if os.path.exists(os.path.join(val_root, "list.txt")):
        return
    os.makedirs(val_root, exist_ok=True)
    names = []
    for name, kw in SCENARIOS:
        sroot = os.path.join(root, name)
        generate(sroot, tracks=tracks, frames=frames, val_sequences=2,
                 presence_dropout=presence_dropout, **kw)
        src_val = os.path.join(sroot, "got10k", "val")
        for seq in sorted(os.listdir(src_val)):
            seq_dir = os.path.join(src_val, seq)
            if not os.path.isdir(seq_dir):
                continue
            combined = f"{name}_{seq}"
            dst = os.path.join(val_root, combined)
            if not os.path.exists(dst):
                os.symlink(seq_dir, dst)
            names.append(combined)
    with open(os.path.join(val_root, "list.txt"), "w") as fh:
        fh.write("\n".join(names))


def dataset_entry(root: str, name: str, num_samples: int, frame_offset: int):
    return {
        "name": name, "root": os.path.join(root, name),
        "image_cache": True,
        "sizes": {
            "search_image_size": 256, "template_image_size": 128,
            "search_context": 2, "template_bbox_offset": 0.2,
            "search_image_shift": 32, "search_image_scale": 0.2,
            "context_range": 1,
        },
        "regression_weight_label_size": 16,
        "sampling": {
            "type": "track",
            "data_path": os.path.join(root, name, "train.csv"),
            "negative_ratio": 0.1, "frame_offset": frame_offset,
            "num_samples": num_samples, "clip_range": True,
        },
    }


def build_config(root: str, exp: str, platform: str, args, pretrained: str):
    return {
        "platform": platform,
        "num_devices": 1,
        "sync_bn": False,
        "precision": "bfloat16",
        "seed": args.seed,
        "model": {
            "name": args.model, "adjust_channels": 256, "towernum": args.towernum,
            "pretrained_weights": pretrained,
        },
        "tracker": {
            "score_size": 16, "total_stride": 16, "instance_size": 256,
            "template_size": 128, "penalty_k": 0.062, "window_influence": 0.38,
            "lr": 0.765, "template_bbox_offset": 0.2, "search_context": 2,
        },
        # clip + skip-non-finite: the first full-length run NaN'd at epoch 8
        # (loss spike -> poisoned Adam moments -> unrecoverable); global-norm
        # clipping bounds the update and apply_if_finite skips any residual
        # bad step instead of absorbing it (benchmarks/raw_round5/flagship.log)
        "optimizer": {"name": "adam", "lr": args.lr,
                      "gradient_clip_val": 1.0, "skip_non_finite": 100},
        "scheduler": {"mode": "max", "patience": 5, "factor": 0.5, "min_lr": 1e-5},
        "loss": {"coeffs": {"TARGET_CLASSIFICATION_KEY": 1, "TARGET_REGRESSION_LABEL_KEY": 1}},
        "batch_size": {"train": args.batch, "val": 1},
        "num_workers": 2,
        "max_epochs": args.epochs,
        "min_epochs": (min(40, args.epochs) if args.min_epochs is None
                       else args.min_epochs),
        "early_stopping": args.early_stopping,
        "metric_mode": "max",
        "max_val_samples": 24,
        "val_batched": True,
        "val_streams": 16,
        "val_frame_hw": (288, 384),
        "sanity_steps": 1,
        "log_every_n_steps": 50,
        "save_top_k": 5,
        "resume": args.resume,
        # reference curriculum shape (ref: fear_lightning_model.py:266-284)
        "dynamic_frame_offset": {"start_epoch": 8, "freq": 2, "step": 2, "max_value": 20},
        "experiment": {"folder": exp, "name": "FLAGSHIP"},
        "train": {"datasets": [
            dataset_entry(root, name, args.num_samples, frame_offset=6)
            for name, _ in SCENARIOS
        ]},
        "val": {"datasets": [{
            "name": "got10k", "root_dir": os.path.join(root, "val_all"), "subset": "val",
        }]},
    }


def export_npz(state, out_path: str):
    import numpy as np

    from tools.export_weights import save_npz

    variables = {
        "params": state.params,
        "batch_stats": state.batch_stats,
    }
    import jax

    variables = jax.tree.map(
        lambda x: np.asarray(x, np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        variables,
    )
    save_npz(variables, out_path)


def quality_gate_eval(weights_path: str, label: str, model_name: str = "fear_xs",
                      towernum: int = 2):
    """The test_quality_gate.py protocol, run standalone: sequential +
    batched-letterboxed AO on the held-out drift suite (seed 3)."""
    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.batched_eval import batched_evaluate
    from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
    from feartracker_tpu.evaluate.harness import build_scan_tracker
    from feartracker_tpu.tracker.tracker import FEARTracker

    root = tempfile.mkdtemp(prefix="flagship_gate_")
    generate(root, tracks=1, frames=12, val_sequences=3, seed=3,
             scenario="drift", appearance_drift=0.5)
    ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
    scan, provenance = build_scan_tracker(
        weights_path=weights_path, model_name=model_name, towernum=towernum)
    seq = evaluate_tracker(FEARTracker(scan.model, scan.variables), ds)
    bat = batched_evaluate(scan, ds, streams=3, frame_hw=(120, 168))
    rec = {"gate": label, "weights": weights_path, "provenance": provenance,
           "sequential_ao": round(float(seq["ao"]), 4),
           "batched_letterboxed_ao": round(float(bat["ao"]), 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/flagship_corpus")
    ap.add_argument("--exp", default="/tmp/flagship_exp")
    ap.add_argument("--out", default=None,
                    help="default: feartracker_tpu/weights/<model>_repo.npz")
    ap.add_argument("--platform", default="", help='"" = default backend (TPU)')
    # model FAMILY training (VERDICT r4 #2): same corpus, same recipe, the
    # fear_m / fear_l trunks; --warm_start transfers a trained XS checkpoint
    # via the non-strict partial loader (measured: XS→M warm start pays,
    # BENCHMARKS.md "Model family")
    ap.add_argument("--model", default="fear_xs",
                    choices=["fear_xs", "fear_m", "fear_l"])
    ap.add_argument("--towernum", type=int, default=None,
                    help="default: 2 (xs/m), 3 (l)")
    ap.add_argument("--warm_start", default=None,
                    help="npz checkpoint to transfer from (replaces the "
                    "classification pretrain stage)")
    ap.add_argument("--epochs", type=int, default=110)
    ap.add_argument("--min_epochs", type=int, default=None,
                    help="default: min(40, epochs)")
    ap.add_argument("--early_stopping", type=int, default=18)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_samples", type=int, default=512, help="per scenario per epoch")
    ap.add_argument("--tracks", type=int, default=48, help="per scenario")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--presence_dropout", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pretrain_npz", default=None)
    ap.add_argument("--per_class", type=int, default=120)
    ap.add_argument("--pretrain_epochs", type=int, default=3)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="only restore best + export + gate eval")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        args.epochs, args.num_samples, args.tracks = 1, 16, 3
        args.frames, args.per_class, args.pretrain_epochs = 8, 8, 1

    if args.towernum is None:
        args.towernum = 3 if args.model == "fear_l" else 2
    if args.out is None:
        args.out = f"feartracker_tpu/weights/{args.model}_repo.npz"

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    t0 = time.time()
    build_corpus(args.root, args.tracks, args.frames, args.presence_dropout)
    print(json.dumps({"corpus": args.root,
                      "scenarios": [n for n, _ in SCENARIOS],
                      "gen_s": round(time.time() - t0, 1)}), flush=True)

    # initialization: an explicit warm start (family runs transfer the
    # trained XS flagship) or classification pretraining (reused across
    # resumes)
    if args.warm_start:
        npz = args.warm_start
        if not os.path.exists(npz):
            raise SystemExit(f"--warm_start {npz} does not exist")
    else:
        npz = args.pretrain_npz or os.path.join(args.root, f"{args.model}_trunk.npz")
        if args.model == "fear_xs" and not os.path.exists(npz):
            legacy = os.path.join(args.root, "fear_xs_trunk.npz")
            npz = legacy if os.path.exists(legacy) else npz
    if not os.path.exists(npz):
        from tools.make_class_dataset import generate_classes
        from tools.pretrain_trunk import train as pretrain

        cls_root = os.path.join(args.root, "cls")
        if not os.path.exists(cls_root):
            generate_classes(cls_root, per_class=args.per_class, seed=args.seed)
        rec = pretrain(cls_root, args.model, npz, epochs=args.pretrain_epochs,
                       batch_size=args.batch, image_size=128, seed=args.seed)
        print(json.dumps({"pretrain_final": rec["history"][-1],
                          "arrays": rec["arrays"]}), flush=True)

    from feartracker_tpu.train.loop import Trainer

    trainer = Trainer(build_config(args.root, args.exp, args.platform, args, npz))
    trainer.setup_data()
    trainer.setup_state(args.seed)

    if not args.skip_train:
        curves = []
        orig_train_epoch, orig_validate = trainer.train_epoch, trainer.validate

        def train_epoch(epoch):
            te0 = time.time()
            m = orig_train_epoch(epoch)
            curves.append({"epoch": epoch, "epoch_s": round(time.time() - te0, 1),
                           **{k: round(float(v), 4) for k, v in m.items()}})
            return m

        def validate(epoch):
            v = orig_validate(epoch)
            if curves and epoch >= 0:
                curves[-1].update({f"val_{k}": round(float(x), 4) for k, x in v.items()})
                print(json.dumps(curves[-1]), flush=True)
            return v

        trainer.train_epoch, trainer.validate = train_epoch, validate
        trainer.fit()
        print(json.dumps({"train_done_steps": int(trainer.state.step),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

    # best checkpoint → zoo artifact
    best = trainer.ckpt.best_step()
    if best is not None:
        state = trainer.ckpt.restore(trainer.state)
        print(json.dumps({"restored_best_step": int(best)}), flush=True)
    else:
        state = trainer.state
        print(json.dumps({"restored_best_step": None, "note": "using last state"}),
              flush=True)
    export_npz(state, args.out)
    print(json.dumps({"exported": args.out,
                      "mb": round(os.path.getsize(args.out) / 2**20, 1)}), flush=True)

    # side-by-side quality-gate scoring (the reference yardstick is always
    # its recovered FEAR-XS — for fear_m/fear_l that's the cross-family bar)
    repo = quality_gate_eval(args.out, "repo_trained",
                             model_name=args.model, towernum=args.towernum)
    ref = quality_gate_eval("fear_xs", "recovered_reference")
    print(json.dumps({
        "summary": {
            "repo_sequential_ao": repo["sequential_ao"],
            "ref_sequential_ao": ref["sequential_ao"],
            "repo_batched_ao": repo["batched_letterboxed_ao"],
            "ref_batched_ao": ref["batched_letterboxed_ao"],
            "sequential_gap": round(ref["sequential_ao"] - repo["sequential_ao"], 4),
            "batched_gap": round(ref["batched_letterboxed_ao"] - repo["batched_letterboxed_ao"], 4),
            "target": "gap <= 0.05 on both paths",
            "wall_s": round(time.time() - t0, 1),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
