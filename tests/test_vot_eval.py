"""VOT supervised protocol: failure/re-init mechanics, burn-in accuracy,
EAO segment construction — checked with a scripted tracker on synthetic
sequences (no model involved)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from feartracker_tpu.evaluate.vot_eval import (
    _burnin_mask,
    _segments,
    eao_from_segments,
    evaluate_vot,
    supervised_run,
)


class ScriptedTracker:
    """Replays a fixed box per frame index; re-init snaps to the given box."""

    def __init__(self, script):
        self.script = script  # frame index -> bbox
        self.frame = 0
        self.inits = []

    def initialize(self, image, bbox):
        self.inits.append((self.frame, np.asarray(bbox)))

    def update(self, image):
        self.frame += 1
        return {"bbox": np.asarray(self.script.get(self.frame, self.script[-1]), np.float64)}


def _make_seq(tmp_path, n):
    files = []
    for i in range(n):
        p = str(tmp_path / f"{i:03d}.png")
        cv2.imwrite(p, np.zeros((8, 8, 3), np.uint8))
        files.append(p)
    return files


class OneSeqDataset:
    def __init__(self, files, anno):
        self.files, self.anno = files, anno

    def __len__(self):
        return 1

    def __getitem__(self, i):
        return self.files, self.anno, "synthetic"

    def sequence_name(self, i):
        return "seq0"


def test_supervised_run_reinit_and_skip(tmp_path):
    n = 12
    files = _make_seq(tmp_path, n)
    gt = np.tile(np.array([[10.0, 10.0, 4.0, 4.0]]), (n, 1))
    # perfect frames 1-3, zero overlap at 4 (failure), perfect afterwards
    script = {i: [10, 10, 4, 4] for i in range(n)}
    script[4] = [100, 100, 4, 4]
    script[-1] = [10, 10, 4, 4]
    tr = ScriptedTracker(script)

    # patch the frame counter to follow the protocol's jumps
    overlaps, valid, failures, inits = supervised_run(tr, files, gt, skip=3)

    assert failures == [4]
    assert inits[0] == 0 and inits[1] == 7  # re-init 3 frames after failure... (4+3)
    assert not valid[5:7].any()  # the skipped gap is invalid
    assert overlaps[0] == 1.0 and overlaps[7] == 1.0  # init frames score 1
    assert overlaps[4] == 0.0


def test_supervised_tracker_never_fails(tmp_path):
    n = 6
    files = _make_seq(tmp_path, n)
    gt = np.tile(np.array([[10.0, 10.0, 4.0, 4.0]]), (n, 1))
    tr = ScriptedTracker({i: [10, 10, 4, 4] for i in range(n)} | {-1: [10, 10, 4, 4]})
    overlaps, valid, failures, inits = supervised_run(tr, files, gt)
    assert failures == [] and inits == [0]
    assert valid.all()
    np.testing.assert_allclose(overlaps, 1.0)


def test_burnin_mask():
    mask = _burnin_mask(10, inits=[0, 6], burnin=3)
    assert mask.tolist() == [False] * 3 + [True] * 3 + [False] * 3 + [True]


def test_segments_zero_after_failure():
    n = 8
    overlaps = np.array([1.0, 0.8, 0.6, 0.0, np.nan, 1.0, 0.9, 0.7])
    valid = np.array([1, 1, 1, 1, 0, 1, 1, 1], bool)
    segs = _segments(overlaps, valid, failures=[3], inits=[0, 5], n=n)
    assert len(segs) == 2
    # segment 0: frames 0..2 overlap, zero from the failure on, padded to n
    np.testing.assert_allclose(segs[0], [1.0, 0.8, 0.6, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(segs[1], [1.0, 0.9, 0.7])


def test_eao_curve_and_interval():
    segs = [np.array([1.0, 1.0, 0.0, 0.0]), np.array([1.0, 0.5])]
    res = eao_from_segments(segs, interval=(1, 2))
    # Phi(1) = mean(1, 1) = 1; Phi(2) = mean(1.0, 0.75) = 0.875
    assert res["curve"][0] == pytest.approx(1.0)
    assert res["curve"][1] == pytest.approx(0.875)
    assert res["eao"] == pytest.approx((1.0 + 0.875) / 2)
    assert eao_from_segments([], None)["eao"] == 0.0


def test_supervised_with_real_tracker(tmp_path):
    """Integration: the real FEAR-XS tracker under the supervised protocol on
    a VOT-layout mini dataset built from the test video, with the
    reference-parity golden trajectory as groundtruth — near-perfect
    accuracy, zero failures."""
    import json
    import os

    golden_path = os.path.join(os.path.dirname(__file__), "golden", "reference_trajectory.json")
    gold = json.load(open(golden_path))
    if not os.path.exists(gold["video"]):
        pytest.skip("reference assets not mounted")
    import numpy as np

    from feartracker_tpu.convert.fear_weights import load_fear_xs
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.tracker import FEARTracker
    from feartracker_tpu.utils.video import read_video

    n = 12
    frames = read_video(gold["video"], max_frames=n)
    seq = tmp_path / "seq" / "color"
    seq.mkdir(parents=True)
    for i, f in enumerate(frames):
        cv2.imwrite(str(seq / f"{i+1:08d}.jpg"), f[:, :, ::-1])  # RGB -> BGR
    rows = [np.asarray(gold["initial_bbox"], float)] + [
        np.asarray(b, float) for b in gold["boxes"][: n - 1]
    ]
    with open(tmp_path / "seq" / "groundtruth.txt", "w") as fh:
        for r in rows:
            fh.write(",".join(f"{v:.2f}" for v in r) + "\n")

    from feartracker_tpu.data.sequence import VOTDataset

    dataset = VOTDataset(str(tmp_path))
    model = FEARNet()
    tracker = FEARTracker(
        model,
        load_fear_xs("/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"),
        TrackerConfig(),
    )
    res = evaluate_vot(tracker, dataset, burnin=1)
    assert res["robustness_failures"] == 0.0
    assert res["accuracy"] > 0.9  # JPEG recompression costs a little IoU
    assert res["num_sequences"] == 1


def test_accuracy_excludes_init_and_failure_frames(tmp_path):
    """With burnin=0 the synthetic init 1.0s and the failure-frame 0.0 must
    still be excluded from accuracy."""
    n = 10
    files = _make_seq(tmp_path, n)
    gt = np.tile(np.array([[10.0, 10.0, 4.0, 4.0]]), (n, 1))
    # constant 50%-overlap prediction, except total miss at frame 4
    half = [10, 10, 2, 4]  # IoU = 0.5
    script = {i: half for i in range(n)}
    script[4] = [100, 100, 4, 4]
    script[-1] = half
    res = evaluate_vot(ScriptedTracker(script), OneSeqDataset(files, gt), skip=3, burnin=0)
    # scored frames are exactly the tracked half-overlap ones: neither the
    # two init frames (0, 7) nor the failure frame (4) contribute
    assert res["accuracy"] == pytest.approx(0.5)
    assert res["robustness_failures"] == 1.0


def test_evaluate_vot_end_to_end(tmp_path):
    n = 12
    files = _make_seq(tmp_path, n)
    gt = np.tile(np.array([[10.0, 10.0, 4.0, 4.0]]), (n, 1))
    script = {i: [10, 10, 4, 4] for i in range(n)}
    script[4] = [100, 100, 4, 4]
    script[-1] = [10, 10, 4, 4]
    res = evaluate_vot(ScriptedTracker(script), OneSeqDataset(files, gt), skip=3, burnin=2)
    assert res["robustness_failures"] == 1.0
    assert res["num_sequences"] == 1
    assert 0.0 < res["accuracy"] <= 1.0
    assert 0.0 < res["eao"] <= 1.0
    assert res["reliability_s100"] == pytest.approx(np.exp(-100 / 12))
    assert "seq0" in res["per_sequence"]


def test_vot_unified_swap_regression(tmp_path):
    """Supervised-protocol regression for the unified failure-handling study
    (BENCHMARKS.md "Unified failure-handling study"): EMA@1 dual-template
    updates must keep their identity-swap robustness win UNDER RE-INITS —
    the full 5-seed result is −2.2 ± 0.6 failures/sequence vs static (CI
    excludes zero). Mini protocol pinned here: seed 7, 4×48-frame swap
    sequences, measured 2026-08-19 CPU: static 3 failures / EAO 0.689,
    EMA@1 1 failure / EAO 0.749."""
    import os
    import tempfile

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.harness import build_scan_tracker
    from feartracker_tpu.tracker.tracker import FEARTracker

    root = tempfile.mkdtemp(prefix="vot_swap_gate_")
    generate(root, tracks=1, frames=48, val_sequences=4, seed=7,
             scenario="swap")
    ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
    scan, prov = build_scan_tracker()
    if prov != "fear_xs":
        pytest.skip("recovered FEAR-XS weights unavailable")

    static = evaluate_vot(
        FEARTracker(scan.model, scan.variables), ds, skip=5, burnin=10)
    ema = evaluate_vot(
        FEARTracker(scan.model, scan.variables, dynamic_template=True,
                    update_threshold=0.85, update_rate=0.2,
                    update_interval=1),
        ds, skip=5, burnin=10)
    assert ema["robustness_failures"] < static["robustness_failures"], (
        f"EMA@1 lost its swap robustness win: "
        f"ema={ema['robustness_failures']} static={static['robustness_failures']}"
    )
    assert ema["eao"] >= static["eao"] - 0.02, (
        f"EMA@1 swap EAO regressed: ema={ema['eao']:.4f} "
        f"static={static['eao']:.4f}"
    )
