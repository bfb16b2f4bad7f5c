"""Quality-regression gate (VERDICT r3 #5): minimum AO with the recovered
FEAR-XS weights on a deterministic mini synthetic suite, on BOTH evaluation
paths (sequential full-resolution and batched letterboxed). Parity goldens
elsewhere pin exact trajectories for fixed inputs; these tests instead pin a
quality FLOOR, so refactors that change numerics legitimately (new kernels,
fusion, dtype moves) still cannot silently degrade tracking.

The suite is generated in-process from a fixed seed (tools/make_synthetic_
dataset is deterministic given the seed), i.e. the fixture is reproducible
from committed code alone. Thresholds are locked ~0.05 below the measured
values (sequential 0.843, batched letterboxed 0.832, 2026-08-17 CPU) —
loose enough for cross-backend numeric drift, tight enough that any real
regression (crop geometry, decode, template handling) trips them.
"""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_synthetic_dataset import generate  # noqa: E402

from feartracker_tpu.data.sequence import GOT10kDataset  # noqa: E402
from feartracker_tpu.evaluate.batched_eval import batched_evaluate  # noqa: E402
from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker  # noqa: E402
from feartracker_tpu.evaluate.harness import build_scan_tracker  # noqa: E402

# mini suite: 3×12-frame drift sequences at the generator's native 160×224
SEED, FRAMES, SEQS = 3, 12, 3
# a canvas SMALLER than the sequences, so the batched path really exercises
# the reduced-resolution letterbox branch it uses on oversized real videos
SMALL_CANVAS = (120, 168)


@pytest.fixture(scope="module")
def suite():
    root = tempfile.mkdtemp(prefix="quality_gate_")
    generate(root, tracks=1, frames=FRAMES, val_sequences=SEQS, seed=SEED,
             scenario="drift", appearance_drift=0.5)
    return GOT10kDataset(os.path.join(root, "got10k"), subset="val")


@pytest.fixture(scope="module")
def scan_tracker():
    tracker, provenance = build_scan_tracker()
    if provenance != "fear_xs":
        pytest.skip("recovered FEAR-XS weights unavailable")
    return tracker


def test_quality_gate_sequential(suite, scan_tracker):
    """Reference-protocol per-frame tracking at full resolution."""
    from feartracker_tpu.tracker.tracker import FEARTracker

    tracker = FEARTracker(scan_tracker.model, scan_tracker.variables)
    res = evaluate_tracker(tracker, suite)
    assert res["ao"] >= 0.78, f"sequential AO regressed: {res['ao']:.4f}"


def test_quality_gate_batched_letterboxed(suite, scan_tracker):
    """Production batched scan path, letterboxed below sequence resolution."""
    res = batched_evaluate(scan_tracker, suite, streams=SEQS, frame_hw=SMALL_CANVAS)
    assert res["ao"] >= 0.78, f"batched letterboxed AO regressed: {res['ao']:.4f}"


def test_letterbox_penalty_bounded(scan_tracker):
    """Paired 2× resolution experiment (tools/letterbox_penalty.py protocol,
    shrunk): the same scene rendered at 2× the canvas, scored through a
    fitting canvas vs the letterboxed (half-resolution) one. Bounds the
    quality skew the letterbox path can feed into in-training validation
    (train/loop.py val_batched ranks checkpoints with it)."""
    root = tempfile.mkdtemp(prefix="letterbox_bound_")
    big = (2 * SMALL_CANVAS[0], 2 * SMALL_CANVAS[1])
    generate(root, tracks=1, frames=10, val_sequences=2, seed=7,
             size=big, obj_scale=2.0, scenario="drift", appearance_drift=0.5)
    ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
    fit = batched_evaluate(scan_tracker, ds, streams=2, frame_hw=big)
    lb = batched_evaluate(scan_tracker, ds, streams=2, frame_hw=SMALL_CANVAS)
    assert lb["ao"] >= fit["ao"] - 0.06, (
        f"letterbox penalty exceeded bound: fit={fit['ao']:.4f} lb={lb['ao']:.4f}"
    )


@pytest.fixture(scope="module")
def repo_tracker():
    """The framework's OWN trained artifact (tools/train_flagship.py, round 5)
    — the quality gate additionally pins the shipped repo-trained checkpoint,
    not just the recovered reference weights (VERDICT r4 #1)."""
    tracker, provenance = build_scan_tracker(weights_path="fear_xs_repo")
    if provenance not in ("fear_xs_repo", "fear_xs_repo.npz"):
        pytest.skip("repo-trained flagship weights unavailable")
    return tracker


def test_repo_trained_sequential(suite, repo_tracker):
    """fear_xs_repo must keep beating the recovered reference on the gate
    suite (measured 0.947 CPU / 0.943 TPU vs the reference's 0.85; floor
    locked ~0.05 below, still above the reference checkpoint's score)."""
    from feartracker_tpu.tracker.tracker import FEARTracker

    tracker = FEARTracker(repo_tracker.model, repo_tracker.variables)
    res = evaluate_tracker(tracker, suite)
    assert res["ao"] >= 0.89, f"repo-trained sequential AO regressed: {res['ao']:.4f}"


def test_repo_trained_batched_letterboxed(suite, repo_tracker):
    """Batched letterboxed path (measured 0.924 CPU / 0.922 TPU)."""
    res = batched_evaluate(repo_tracker, suite, streams=SEQS, frame_hw=SMALL_CANVAS)
    assert res["ao"] >= 0.87, f"repo-trained batched AO regressed: {res['ao']:.4f}"


@pytest.fixture(scope="module")
def fear_m_tracker():
    """The trained FEAR-M family checkpoint (round 5) — the first trained
    FEAR-M anywhere (the reference's paper names it, its repo ships nothing —
    ref README.md:28)."""
    tracker, provenance = build_scan_tracker(
        weights_path="fear_m_repo", model_name="fear_m")
    if provenance not in ("fear_m_repo", "fear_m_repo.npz"):
        pytest.skip("trained fear_m weights unavailable")
    return tracker


def test_fear_m_trained_sequential(suite, fear_m_tracker):
    """fear_m_repo must keep beating the recovered reference on the gate
    suite (measured 0.917 CPU / 0.926 TPU vs the reference's 0.85; floor
    ~0.05 below CPU-measured, still above the reference checkpoint)."""
    from feartracker_tpu.tracker.tracker import FEARTracker

    tracker = FEARTracker(fear_m_tracker.model, fear_m_tracker.variables)
    res = evaluate_tracker(tracker, suite)
    assert res["ao"] >= 0.86, f"fear_m sequential AO regressed: {res['ao']:.4f}"


def test_fear_m_trained_batched_letterboxed(suite, fear_m_tracker):
    """Batched letterboxed path (measured 0.908 CPU / 0.904 TPU)."""
    res = batched_evaluate(fear_m_tracker, suite, streams=SEQS, frame_hw=SMALL_CANVAS)
    assert res["ao"] >= 0.85, f"fear_m batched AO regressed: {res['ao']:.4f}"


def test_quality_gate_dual_template(suite, scan_tracker):
    """The dual-template path has its own quality floor: EMA@4 (the
    recommended appearance-morph configuration) on the same mini suite may
    not fall below the static floor band. Measured 0.83 (2026-08-17 CPU)."""
    from feartracker_tpu.tracker.runtime import ScanTracker

    dual = ScanTracker(
        scan_tracker.model, scan_tracker.variables, scan_tracker.config,
        dtype=scan_tracker.dtype, postprocess_impl=scan_tracker.postprocess_impl,
        dynamic_template=True, update_mode="ema", update_threshold=0.85,
        update_rate=0.2, update_interval=4,
    )
    res = batched_evaluate(dual, suite, streams=SEQS, frame_hw=SMALL_CANVAS)
    assert res["ao"] >= 0.76, f"dual-template AO regressed: {res['ao']:.4f}"


def test_quality_gate_recovery(scan_tracker):
    """Zoom-out re-acquisition (recover_context=3) must keep beating the
    static baseline on occlusion content — the one regime where every
    template-update gate measured negative. Mini occlusion suite measured
    2026-08-17 CPU: baseline 0.175, recovery 0.275 (the full 5-seed TPU
    result is +0.195 ± 0.095 AO; BENCHMARKS.md "Zoom-out re-acquisition")."""
    from feartracker_tpu.tracker.runtime import ScanTracker

    root = tempfile.mkdtemp(prefix="recovery_gate_")
    generate(root, tracks=1, frames=24, val_sequences=4, seed=5,
             scenario="occlusion")
    ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
    rec = ScanTracker(
        scan_tracker.model, scan_tracker.variables, scan_tracker.config,
        dtype=scan_tracker.dtype, postprocess_impl=scan_tracker.postprocess_impl,
        recover_context=3.0, recover_threshold=0.7,
    )
    base = batched_evaluate(scan_tracker, ds, streams=4)
    recv = batched_evaluate(rec, ds, streams=4)
    assert recv["ao"] >= base["ao"] + 0.04, (
        f"recovery no longer beats baseline: base={base['ao']:.4f} "
        f"recover={recv['ao']:.4f}"
    )
    assert recv["ao"] >= 0.22, f"recovery AO floor regressed: {recv['ao']:.4f}"
