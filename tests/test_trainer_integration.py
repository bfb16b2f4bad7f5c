"""End-to-end trainer integration: synthetic CSV train data + synthetic
GOT-10k-style val sequences, tiny model, 2 epochs on CPU — exercising the
full loop: steps, TB logs, online-tracking validation, plateau/early-stop
bookkeeping, checkpointing, resample + curriculum."""

import glob
import os

import cv2
import numpy as np
import pandas as pd
import pytest


def _make_track_images(root, n_tracks=2, n_frames=6, size=(160, 200)):
    rows = []
    rng = np.random.RandomState(0)
    for t in range(n_tracks):
        color = rng.randint(80, 255, 3).tolist()
        for f in range(n_frames):
            img = np.full((size[0], size[1], 3), 40, np.uint8)
            x, y, w, h = 30 + 6 * f + 8 * t, 40 + 3 * f, 50, 60
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            path = f"img_t{t}_f{f}.jpg"
            cv2.imwrite(os.path.join(root, path), img)
            rows.append(
                dict(
                    sequence_id=f"s{t}", track_id=f"t{t}", frame_index=f, img_path=path,
                    bbox=str([x, y, w, h]), frame_shape=str(list(size[::-1])),
                    dataset="synthetic", presence=1, near_corner=0,
                )
            )
    return rows


def _make_val_sequences(base, n_seq=1, n_frames=5):
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(1)
    names = []
    for s in range(n_seq):
        seq = f"GOT-10k_Val_{s:06d}"
        seq_dir = os.path.join(base, seq)
        os.makedirs(seq_dir, exist_ok=True)
        color = rng.randint(80, 255, 3).tolist()
        gt = []
        for f in range(n_frames):
            img = np.full((160, 200, 3), 40, np.uint8)
            x, y, w, h = 40 + 5 * f, 50 + 2 * f, 48, 56
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            cv2.imwrite(os.path.join(seq_dir, f"{f:08d}.jpg"), img)
            gt.append(f"{x},{y},{w},{h}")
        with open(os.path.join(seq_dir, "groundtruth.txt"), "w") as fh:
            fh.write("\n".join(gt))
        names.append(seq)
    with open(os.path.join(base, "list.txt"), "w") as fh:
        fh.write("\n".join(names))


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_e2e"))
    rows = _make_track_images(root)
    csv_path = os.path.join(root, "train.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    _make_val_sequences(os.path.join(root, "got10k", "val"))

    exp_dir = os.path.join(root, "exp")
    return {
        "platform": "",
        "num_devices": 1,
        "sync_bn": False,
        "precision": "float32",
        "seed": 0,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {
            "score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32,
            "penalty_k": 0.062, "window_influence": 0.38, "lr": 0.765,
            "template_bbox_offset": 0.2, "search_context": 2,
        },
        "optimizer": {"name": "adam", "lr": 1e-3},
        "scheduler": {"mode": "max", "patience": 2, "factor": 0.5},
        "loss": {"coeffs": {"TARGET_CLASSIFICATION_KEY": 1, "TARGET_REGRESSION_LABEL_KEY": 1}},
        "batch_size": {"train": 4, "val": 1},
        "num_workers": 1,
        "max_epochs": 2,
        "min_epochs": 1,
        "early_stopping": 5,
        "metric_mode": "max",
        "max_val_samples": 5,
        "log_every_n_steps": 1,
        "save_top_k": 2,
        "experiment": {"folder": exp_dir, "name": "TEST"},
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
                        "frame_offset": 4, "num_samples": 8, "clip_range": True,
                    },
                }
            ]
        },
        "val": {"datasets": [{"name": "got10k", "root_dir": os.path.join(root, "got10k"), "subset": "val"}]},
        "dynamic_frame_offset": {"start_epoch": 1, "freq": 1, "step": 1, "max_value": 10},
    }


def test_trainer_end_to_end(tiny_config):
    from feartracker_tpu.train.loop import Trainer

    trainer = Trainer(tiny_config)
    trainer.fit()

    # steps ran: 2 epochs x 2 batches
    assert int(trainer.state.step) == 4
    # validation produced a box_iou
    assert trainer.early_stopping.best is not None
    # checkpoints written (top-k dirs + last)
    ckpt_dir = os.path.join(tiny_config["experiment"]["folder"], "TEST", "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    numbered = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert len(numbered) >= 1
    # TB event files exist
    logs = glob.glob(os.path.join(tiny_config["experiment"]["folder"], "TEST", "logs", "events.*"))
    assert logs
    # curriculum bumped the frame offset (start_epoch=1, freq=1)
    assert trainer.train_dataset.datasets[0].item_sampler.frame_offset > 4


def test_batched_validation_matches_sequential(tiny_config):
    """val_batched routes validation through the scan runtime; on the
    synthetic val set (letterboxed at native resolution) it must agree with
    the sequential per-frame tracker loop."""
    from feartracker_tpu.train.loop import Trainer

    cfg = {
        **tiny_config,
        "experiment": {**tiny_config["experiment"], "name": "BVAL"},
    }
    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.setup_state(0)
    seq = trainer.validate(0)

    trainer.config = {**cfg, "val_batched": True, "val_frame_hw": (160, 200), "val_streams": 2}
    bat = trainer.validate(0)
    assert set(bat) >= {"box_iou", "got10k_box_iou"}
    assert 0.0 <= bat["box_iou"] <= 1.0
    # same sequences, same weights, same resolution: close agreement
    assert abs(bat["box_iou"] - seq["box_iou"]) < 0.1


def test_checkpoint_restore_roundtrip(tiny_config):
    import jax
    import numpy as np

    from feartracker_tpu.train.checkpoint import CheckpointManager
    from feartracker_tpu.train.loop import Trainer

    trainer = Trainer({**tiny_config, "experiment": {**tiny_config["experiment"], "name": "TEST2"}, "max_epochs": 1})
    trainer.setup_data()
    trainer.setup_state()
    trainer.fit()

    fresh = Trainer({**tiny_config, "experiment": {**tiny_config["experiment"], "name": "TEST3"}})
    fresh.setup_state()
    restored = trainer.ckpt.restore_last(fresh.state)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(trainer.state.step)


def test_load_orbax_variables_all_path_forms(tiny_config):
    """The CLI's checkpoint loader resolves an experiment dir, a checkpoints
    root, a managed step dir, and the state dir itself — params identical."""
    import jax
    import numpy as np

    from feartracker_tpu.train.checkpoint import load_orbax_variables
    from feartracker_tpu.train.loop import Trainer

    trainer = Trainer({**tiny_config, "experiment": {**tiny_config["experiment"], "name": "ORBAX"}, "max_epochs": 1})
    trainer.fit()
    exp_dir = trainer.exp_dir
    ckpt_root = trainer.ckpt.directory
    step_dir = f"{ckpt_root}/{int(trainer.state.step)}"
    want = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.params))
    for path in (exp_dir, ckpt_root, step_dir, f"{ckpt_root}/last/state"):
        v = load_orbax_variables(path)
        assert set(v) == {"params", "batch_stats"}
        for a, b in zip(jax.tree.leaves(v["params"]), want):
            np.testing.assert_array_equal(np.asarray(a), b)
    import pytest

    with pytest.raises(FileNotFoundError):
        load_orbax_variables(exp_dir + "/nope")


def test_trainer_resume_from_last(tiny_config):
    """resume=True restores the full train state AND the epoch counter:
    max_epochs is total epochs (Lightning semantics), so a crashed 1-epoch
    run resumed with max_epochs=2 trains exactly one more epoch."""
    from feartracker_tpu.train.loop import Trainer

    cfg = {**tiny_config, "experiment": {**tiny_config["experiment"], "name": "RESUME"}, "max_epochs": 1}
    first = Trainer(cfg)
    first.fit()
    steps_before = int(first.state.step)

    # same max_epochs -> already done, zero extra steps (epoch counter resumed)
    noop = Trainer({**cfg, "resume": True, "max_epochs": 1})
    noop.fit()
    assert int(noop.state.step) == steps_before

    resumed = Trainer({**cfg, "resume": True, "max_epochs": 2})
    resumed.fit()
    assert int(resumed.state.step) == steps_before * 2  # continued, not restarted


def test_resume_epoch_survives_dataset_size_change(tiny_config):
    """The resumed epoch comes from checkpoint metadata, not from
    step // steps_per_epoch: doubling the per-epoch sample count between the
    crashed and the resumed run must not shift the epoch counter (which would
    silently desync resample replay and the frame-offset curriculum)."""
    import copy

    from feartracker_tpu.train.loop import Trainer

    cfg = copy.deepcopy(tiny_config)
    cfg["experiment"]["name"] = "RESUME_SIZED"
    cfg["max_epochs"] = 2
    first = Trainer(cfg)
    first.fit()  # 2 epochs of 8 samples -> last checkpoint records epoch=2

    # resumed run sees a 1.5x-size epoch (12 samples / batch 4 = 3 steps):
    # step-derived epoch would be 4 // 3 = 1, replaying the wrong epoch state
    bigger = copy.deepcopy(cfg)
    bigger["train"]["datasets"][0]["sampling"]["num_samples"] = 12
    bigger["resume"] = True
    noop = Trainer(bigger)
    noop.fit()
    assert noop.resumed_epoch == 2  # metadata, not derivation
    assert int(noop.state.step) == int(first.state.step)  # nothing re-trained

    third = Trainer({**copy.deepcopy(bigger), "max_epochs": 3})
    third.fit()
    assert third.resumed_epoch == 2
    # exactly one extra epoch at the new size
    assert int(third.state.step) == int(first.state.step) + 3
