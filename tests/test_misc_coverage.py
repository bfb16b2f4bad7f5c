"""Coverage for smaller subsystems: profiling timers, serving auto-reinit,
config error paths, video IO, sequence dataset parsing."""

import os
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.evaluate.profiling import StepTimer


def test_step_timer_stats():
    t = StepTimer(window=8)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    s = t.stats()
    assert 5 < s["mean_ms"] < 100
    assert s["steps_per_sec"] > 0
    assert len(t.samples) == 3


def test_step_timer_window_rolls():
    t = StepTimer(window=2)
    for _ in range(5):
        with t:
            pass
    assert len(t.samples) == 2


def test_serving_auto_reinit():
    from feartracker_tpu.models.fbnet import TINY_TRUNK
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.runtime import ScanTracker
    from feartracker_tpu.tracker.serving import StreamPool

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    # random net → low confidence everywhere; threshold 1.0 forces failure
    cfg = TrackerConfig(
        score_size=8, total_stride=8, instance_size=64, template_size=32,
        confidence_threshold=1.1,
    )
    tracker = ScanTracker(model, variables, cfg)
    pool = StreamPool(tracker, capacity=2, frame_hw=(96, 128), auto_reinit=True)
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (96, 128, 3)).astype(np.float32)
    slot = pool.add(frame, [40, 30, 30, 40])
    before = np.asarray(pool.state.template_feats)[slot].copy()
    out = pool.step(np.broadcast_to(frame, (2, 96, 128, 3)))
    assert out["failure"][slot]  # conf < 1.1 always
    after = np.asarray(pool.state.template_feats)[slot]
    # auto re-init re-templated the slot at the predicted box
    assert np.abs(after - before).max() > 0


def test_config_missing_group_option():
    from feartracker_tpu.config.compose import load_config

    with pytest.raises(FileNotFoundError):
        load_config("fear_tracker", overrides=["backend=nonexistent"])


def test_config_bad_list_override_message():
    from feartracker_tpu.config.compose import load_config

    with pytest.raises(KeyError, match="list index"):
        load_config("fear_tracker", overrides=["train.datasets.root=/x"])


def test_video_roundtrip(tmp_path):
    from feartracker_tpu.utils.video import read_video, video_fps, write_video

    frames = [np.full((32, 48, 3), c, np.uint8) for c in (10, 120, 240)]
    path = str(tmp_path / "t.mp4")
    write_video(path, frames, fps=10)
    back = read_video(path)
    assert back.shape == (3, 32, 48, 3)
    assert video_fps(path) == pytest.approx(10, abs=1)
    # lossy codec: means should be close
    assert abs(float(back[1].mean()) - 120) < 10


def test_sequence_gt_parsing(tmp_path):
    from feartracker_tpu.data.sequence import _poly_to_xywh, _read_gt

    p = tmp_path / "gt.txt"
    p.write_text("1,2,3,4\n5 6 7 8\n9\t10\t11\t12\n")
    gt = _read_gt(str(p))
    assert gt.shape == (3, 4)
    np.testing.assert_array_equal(gt[1], [5, 6, 7, 8])

    poly = np.array([0.0, 0, 10, 0, 10, 20, 0, 20])
    np.testing.assert_array_equal(_poly_to_xywh(poly), [0, 0, 10, 20])


def test_vot_dataset_polygon(tmp_path):
    from feartracker_tpu.data.sequence import VOTDataset

    seq = tmp_path / "seq1"
    (seq / "color").mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(seq / "color" / f"{i:08d}.jpg"), np.zeros((30, 40, 3), np.uint8))
    (seq / "groundtruth.txt").write_text("5,5,15,5,15,25,5,25\n6,6,16,6,16,26,6,26\n")
    ds = VOTDataset(str(tmp_path))
    assert len(ds) == 1
    files, anno, name = ds[0]
    assert name == "vot"
    np.testing.assert_array_equal(anno[0], [5, 5, 10, 20])


def test_packaged_weights_load_without_reference_mount():
    """The in-repo fear_xs.npz makes the framework standalone: the loader
    dispatches on .npz, and the bench harness falls back to it (provenance
    stays 'fear_xs') when the CoreML path is unavailable."""
    import numpy as np

    from feartracker_tpu.convert.load import PACKAGED_FEAR_XS, load_variables
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    v = load_variables(PACKAGED_FEAR_XS)
    assert set(v) == {"params", "batch_stats"}
    assert v["params"]["neck"]["downsample"]["conv"]["kernel"].shape == (1, 1, 112, 256)

    tracker, provenance = build_scan_tracker("/nonexistent/Tracker.mlmodel")
    assert provenance == "fear_xs"
    w = np.asarray(tracker.variables["params"]["neck"]["downsample"]["conv"]["kernel"])
    np.testing.assert_array_equal(w, np.asarray(v["params"]["neck"]["downsample"]["conv"]["kernel"]))


def test_model_zoo_second_checkpoint_is_distinct():
    import numpy as np

    from feartracker_tpu.convert.load import PACKAGED_FEAR_XS, load_npz_variables

    other = PACKAGED_FEAR_XS.replace("fear_xs.npz", "fear_xs_noembs.npz")
    a = load_npz_variables(PACKAGED_FEAR_XS)
    b = load_npz_variables(other)
    ka = a["params"]["neck"]["downsample"]["conv"]["kernel"]
    kb = b["params"]["neck"]["downsample"]["conv"]["kernel"]
    assert ka.shape == kb.shape == (1, 1, 112, 256)
    assert not np.array_equal(ka, kb)  # genuinely different checkpoints


def test_zoo_name_resolution():
    from feartracker_tpu.convert.load import load_variables

    v = load_variables("fear_xs_noembs")
    assert set(v) == {"params", "batch_stats"}
