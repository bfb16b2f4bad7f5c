import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np

from feartracker_tpu.data.sequence import GOT10kDataset
from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.tracker import FEARTracker
from feartracker_tpu.train.loop import Trainer

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--root", default="/tmp/synth", help="dataset root from make_synthetic_dataset.py")
_ap.add_argument("--exp", default="/tmp/synth_exp")
_args = _ap.parse_args()
ROOT = _args.root
config = {
    "platform": "cpu", "num_devices": 1, "sync_bn": False, "precision": "float32",
    "seed": 0,
    "model": {"name": "fear_tiny", "adjust_channels": 48, "towernum": 1},
    "tracker": {"score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32,
                "penalty_k": 0.062, "window_influence": 0.38, "lr": 0.765,
                "template_bbox_offset": 0.2, "search_context": 2},
    "optimizer": {"name": "adam", "lr": 3e-4},
    "scheduler": {"mode": "max", "patience": 8, "factor": 0.5},
    "loss": {"coeffs": {"TARGET_CLASSIFICATION_KEY": 1, "TARGET_REGRESSION_LABEL_KEY": 1}},
    "batch_size": {"train": 32, "val": 1},
    "num_workers": 2, "max_epochs": 30, "min_epochs": 5, "early_stopping": 30,
    "metric_mode": "max", "max_val_samples": 24, "log_every_n_steps": 16,
    "save_top_k": 2, "sanity_steps": 1, "check_val_every_n_epoch": 5,
    "experiment": {"folder": _args.exp, "name": "SYNTH"},
    "train": {"datasets": [{
        "name": "synthetic", "root": ROOT,
        "sizes": {"search_image_size": 64, "template_image_size": 32, "search_context": 2,
                  "template_bbox_offset": 0.2, "search_image_shift": 8, "search_image_scale": 0.2,
                  "context_range": 1},
        "regression_weight_label_size": 8,
        "sampling": {"type": "track", "data_path": f"{ROOT}/train.csv", "negative_ratio": 0,
                     "frame_offset": 10, "num_samples": 256, "clip_range": True},
    }]},
    "val": {"datasets": [{"name": "got10k", "root_dir": f"{ROOT}/got10k", "subset": "val"}]},
}

trainer = Trainer(config)
trainer.setup_data(); trainer.setup_state(0)
val = GOT10kDataset(f"{ROOT}/got10k", subset="val")
cfg = trainer.tracker_config

def ao_now(tag):
    variables = {"params": jax.tree.map(np.asarray, trainer.state.params),
                 "batch_stats": jax.tree.map(np.asarray, trainer.state.batch_stats)}
    tr = FEARTracker(trainer.val_model, variables, cfg)
    res = evaluate_tracker(tr, val, max_frames=24)
    print(f"[{tag}] AO={res['ao']:.3f} SR50={res['sr50']:.3f}", flush=True)
    return res

t0=time.time()
before = ao_now("untrained")
trainer.fit()
after = ao_now("trained")
print(f"total {time.time()-t0:.0f}s; AO {before['ao']:.3f} -> {after['ao']:.3f}")
