"""Batched multi-stream evaluation on synthetic GOT-10k-style sequences with
the tiny model: runs, scores, and stays consistent with per-stream lengths."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.data.sequence import GOT10kDataset
from feartracker_tpu.evaluate.batched_eval import batched_evaluate, letterbox
from feartracker_tpu.models.fbnet import TINY_TRUNK
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.runtime import ScanTracker


@pytest.fixture(scope="module")
def synthetic_got10k(tmp_path_factory):
    base = tmp_path_factory.mktemp("got") / "val"
    base.mkdir()
    rng = np.random.RandomState(0)
    names = []
    # sequences of different lengths and sizes
    for s, (n_frames, size) in enumerate([(6, (96, 128)), (4, (72, 96)), (8, (96, 128))]):
        seq = f"GOT-10k_Val_{s:06d}"
        d = base / seq
        d.mkdir()
        color = rng.randint(100, 255, 3).tolist()
        gt = []
        for f in range(n_frames):
            img = np.full((*size, 3), 30, np.uint8)
            x, y, w, h = 20 + 3 * f, 15 + 2 * f, 30, 26
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            cv2.imwrite(str(d / f"{f:08d}.jpg"), img)
            gt.append(f"{x},{y},{w},{h}")
        (d / "groundtruth.txt").write_text("\n".join(gt))
        names.append(seq)
    (base / "list.txt").write_text("\n".join(names))
    return str(base.parent)


def test_letterbox_scales_and_pads():
    frame = np.full((50, 100, 3), 200, np.uint8)
    canvas, scale, placed = letterbox(frame, (64, 64))
    assert placed == (32, 64)
    assert canvas.shape == (64, 64, 3)
    assert scale == pytest.approx(0.64)
    assert canvas[:32, :64].mean() > 150  # image region
    assert canvas[40:, :].max() == 0  # pad region


def test_sharded_batched_eval_equals_single_device(synthetic_got10k):
    """BASELINE config 4 on the mesh: ShardedScanTracker (streams over 4 CPU
    devices, groups padded to mesh size) scores identically to the
    single-device ScanTracker."""
    from feartracker_tpu.parallel.inference import ShardedScanTracker
    from feartracker_tpu.parallel.mesh import make_mesh

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    cfg = TrackerConfig(score_size=8, total_stride=8, instance_size=64, template_size=32)
    dataset = GOT10kDataset(synthetic_got10k, subset="val")

    single = batched_evaluate(
        ScanTracker(model, variables, cfg), dataset, streams=2, frame_hw=(96, 128), chunk=4
    )
    sharded_tracker = ShardedScanTracker(model, variables, cfg, mesh=make_mesh(4))
    # streams=3 forces a 3-sequence group padded to 4 (mesh divisibility)
    sharded = batched_evaluate(
        sharded_tracker, dataset, streams=3, frame_hw=(96, 128), chunk=4
    )
    assert sharded["num_sequences"] == single["num_sequences"] == 3
    for name, ov in single["per_sequence"].items():
        np.testing.assert_allclose(sharded["per_sequence"][name], ov, atol=1e-5)
    assert sharded["ao"] == pytest.approx(single["ao"], abs=1e-5)


def test_batched_evaluate_runs(synthetic_got10k):
    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    cfg = TrackerConfig(score_size=8, total_stride=8, instance_size=64, template_size=32)
    tracker = ScanTracker(model, variables, cfg)
    dataset = GOT10kDataset(synthetic_got10k, subset="val")
    assert len(dataset) == 3
    res = batched_evaluate(tracker, dataset, streams=2, frame_hw=(96, 128), chunk=4)
    assert res["num_sequences"] == 3
    assert 0.0 <= res["ao"] <= 1.0
    # per-sequence overlap arrays have len = seq_len - 1
    assert set(res["per_sequence"]) == {f"GOT-10k_Val_{s:06d}" for s in range(3)}

    # multi-host shard striding: hosts cover disjoint, jointly-exhaustive
    # sequence subsets with per-sequence scores matching the full run
    shards = [
        batched_evaluate(tracker, dataset, streams=2, frame_hw=(96, 128), chunk=4,
                         sequence_stride=(rank, 2))
        for rank in range(2)
    ]
    names = [set(s["per_sequence"]) for s in shards]
    assert names[0] | names[1] == set(res["per_sequence"]) and not (names[0] & names[1])
    for s in shards:
        for name, ao in s["per_sequence"].items():
            assert ao == pytest.approx(res["per_sequence"][name], abs=1e-6)
    # a rank with no sequences yields an empty, well-formed result
    empty = batched_evaluate(tracker, dataset, streams=2, frame_hw=(96, 128), chunk=4,
                             sequence_stride=(3, 4))
    assert empty["num_sequences"] == 0 and empty["per_sequence"] == {}
