"""train.py CLI smoke test — the training entry as a real subprocess
(ref: model_training/train.py: ``python model_training/train.py
backend=2gpu``), composing backend/model/tracker/utility_overrides groups
on a generated GOT-10k-layout synthetic dataset."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_cli_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_synthetic_dataset import generate

    # dataset config expects ${visual_object_tracking_datasets}/got10k/{train.csv, val}
    vot_root = tmp_path / "data"
    got_root = vot_root / "got10k"
    generate(str(got_root), tracks=2, frames=8, val_sequences=1, seed=5)
    # generate() writes val sequences under <root>/got10k/val; the config
    # expects them at <root>/val — relocate
    os.rename(str(got_root / "got10k" / "val"), str(got_root / "val"))

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    exp = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, "train.py",
         "backend=cpu", "model=fear_tiny", "tracker=tiny_tracker",
         "utility_overrides=local_fast",
         f"visual_object_tracking_datasets={vot_root}",
         f"experiment.folder={exp}", "experiment.name=CLI",
         "max_val_samples=4", "sizes.search_image_shift=8",
         "sizes.search_image_scale=0.2", "sizes.context_range=1"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # experiment dir materialized: config snapshot + a checkpoint
    exp_dir = exp / "CLI"
    assert (exp_dir / "experiment_config.yaml").exists()
    ckpt_root = exp_dir / "checkpoints"
    assert (ckpt_root / "last" / "state").is_dir()
    assert (ckpt_root / "last" / "meta.json").exists()  # epoch metadata

    # the written checkpoint loads back through the universal loader
    from feartracker_tpu.train.checkpoint import load_orbax_variables

    v = load_orbax_variables(str(exp_dir))
    assert set(v) == {"params", "batch_stats"}
