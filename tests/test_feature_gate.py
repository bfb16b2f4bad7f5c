"""Gate v2 (feature-conditioned dual-template update gate): module contract,
runtime integration, visibility-oracle supervision source."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.models.fbnet import TINY_TRUNK
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.models.gate import (
    N_OBS,
    gate_observables,
    gate_rate,
    init_gate_params,
    load_gate,
    save_gate,
)
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.runtime import ScanTracker

CFG = TrackerConfig(score_size=8, total_stride=8, instance_size=64, template_size=32)


def _setup():
    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    rng = np.random.RandomState(0)
    S, T = 4, 3
    frames0 = rng.randint(0, 255, (S, 96, 128, 3)).astype(np.float32)
    chunk = rng.randint(0, 255, (T, S, 96, 128, 3)).astype(np.float32)
    bboxes = np.tile(np.array([[40, 30, 30, 40]], np.float32), (S, 1))
    return model, variables, frames0, chunk, bboxes


def _biased_gate(bias: float):
    """A gate whose output is pinned by the final bias (w2=0)."""
    params = init_gate_params(np.random.RandomState(0))
    params["w2"][:] = 0.0
    params["b2"][:] = bias
    return params


def test_gate_module_contract():
    rng = np.random.RandomState(1)
    params = init_gate_params(rng)
    obs = rng.randn(5, N_OBS).astype(np.float32)
    r = np.asarray(gate_rate(params, jnp.asarray(obs)))
    assert r.shape == (5,)
    assert (r >= 0).all() and (r <= 1).all()

    # observables: identical candidate/template → cosine 1; stationary box →
    # zero size-ratio and shift; confidence passes through
    S = 3
    feats = jnp.asarray(rng.randn(S, 4, 4, 8), jnp.float32)
    bbox = jnp.asarray([[10, 10, 20, 30]] * S, jnp.float32)
    conf = jnp.asarray([0.1, 0.5, 0.9])
    apce = jnp.asarray([3.0, 10.0, 30.0])
    obs = np.asarray(gate_observables(conf, apce, feats, feats, feats, bbox, bbox))
    assert obs.shape == (S, N_OBS)
    np.testing.assert_allclose(obs[:, 0], [0.1, 0.5, 0.9], atol=1e-6)
    np.testing.assert_allclose(obs[:, 2], 1.0, atol=1e-5)  # sim_static
    np.testing.assert_allclose(obs[:, 3], 1.0, atol=1e-5)  # sim_dyn
    np.testing.assert_allclose(obs[:, 4], 0.0, atol=1e-6)  # log_size_ratio
    np.testing.assert_allclose(obs[:, 5], 0.0, atol=1e-6)  # center_shift

    # save/load roundtrip + observable-count validation
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "gate.npz")
        save_gate(params, path)
        loaded = load_gate(path)
        for k in params:
            np.testing.assert_array_equal(params[k], loaded[k])
        bad = dict(params, w1=params["w1"][:2])
        save_gate(bad, path)
        with pytest.raises(ValueError):
            load_gate(path)


def test_feature_mode_closed_gate_keeps_static_template():
    model, variables, frames0, chunk, bboxes = _setup()
    tr = ScanTracker(
        model, variables, CFG, dynamic_template=True, update_mode="feature",
        update_rate=0.3, gate_params=_biased_gate(-12.0),
    )
    state = tr.init(frames0, bboxes)
    state, out = tr.track(state, chunk)
    # sigmoid(-12) ≈ 6e-6: the dynamic template must stay ≈ the static one
    np.testing.assert_allclose(
        np.asarray(state.dyn_feats), np.asarray(state.template_feats), atol=1e-4
    )
    assert "gate_obs" in out and np.asarray(out["gate_obs"]).shape[-1] == N_OBS
    assert np.isfinite(np.asarray(out["gate_obs"])).all()


def test_feature_mode_open_gate_matches_ungated_ema():
    """sigmoid(+12)≈1: the feature mode must reproduce an EMA whose updates
    are never blocked (threshold −1)."""
    model, variables, frames0, chunk, bboxes = _setup()
    feat = ScanTracker(
        model, variables, CFG, dynamic_template=True, update_mode="feature",
        update_rate=0.3, gate_params=_biased_gate(12.0),
    )
    ema = ScanTracker(
        model, variables, CFG, dynamic_template=True, update_mode="ema",
        update_rate=0.3, update_threshold=-1.0,
    )
    fs = feat.init(frames0, bboxes)
    es = ema.init(frames0, bboxes)
    fs, fout = feat.track(fs, chunk)
    es, eout = ema.track(es, chunk)
    np.testing.assert_allclose(
        np.asarray(fs.dyn_feats), np.asarray(es.dyn_feats), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fout["bbox"]), np.asarray(eout["bbox"]), atol=1e-3
    )


def test_feature_mode_validation_errors():
    model, variables, frames0, chunk, bboxes = _setup()
    with pytest.raises(ValueError):
        ScanTracker(model, variables, CFG, dynamic_template=True, update_mode="feature")
    with pytest.raises(ValueError):
        ScanTracker(
            model, variables, CFG, dynamic_template=True, update_mode="ema",
            gate_params=_biased_gate(0.0),
        )


def test_sharded_feature_mode():
    from feartracker_tpu.parallel.inference import ShardedScanTracker
    from feartracker_tpu.parallel.mesh import make_mesh

    model, variables, frames0, chunk, bboxes = _setup()
    S = 8
    frames0 = np.tile(frames0[:1], (S, 1, 1, 1))
    chunk = np.tile(chunk[:, :1], (1, S, 1, 1, 1))
    bboxes = np.tile(bboxes[:1], (S, 1))
    tr = ShardedScanTracker(
        model, variables, CFG, mesh=make_mesh(8), dynamic_template=True,
        update_mode="feature", update_rate=0.2,
        gate_params=_biased_gate(0.0),
    )
    state = tr.init(frames0, bboxes)
    state, out = tr.track(state, chunk)
    assert np.isfinite(np.asarray(out["bbox"])).all()
    assert len(state.dyn_feats.sharding.device_set) == 8


def test_generator_visibility_oracle(tmp_path):
    """cover.label: occlusion sequences dip below full visibility exactly
    around the bar crossings; drift sequences stay fully visible; the train
    CSV carries the same oracle as a 'visible' column."""
    import pandas as pd

    from tools.make_synthetic_dataset import generate

    occ = tmp_path / "occ"
    n = 48  # the eval-suite length: crossings at 16 and 32 are localized
    generate(str(occ), tracks=1, frames=n, val_sequences=1, seed=5,
             scenario="occlusion")
    seq = occ / "got10k" / "val" / "GOT-10k_Val_000000"
    cover = np.array([int(x) for x in (seq / "cover.label").read_text().split()])
    n_frames = len(list(seq.glob("*.jpg")))
    assert len(cover) == n_frames == n
    assert (0 <= cover).all() and (cover <= 8).all()
    assert cover.min() <= 2, "bar crossings must strongly reduce visibility"
    # the sweep is 6 px/frame: frames far from both crossings stay visible,
    # and every occluded frame lies near a crossing (bar+object ≤ ~96 px wide
    # → ≤ 9 frames of overlap per side, taking the near-corner clipping slack)
    assert cover[0] == 8 and cover[-1] == 8
    occluded_frames = np.where(cover < 8)[0]
    crossings = np.array([n // 3, 2 * n // 3])
    assert all(np.abs(crossings - f).min() <= 9 for f in occluded_frames)
    assert all(int(c) in occluded_frames for c in crossings)

    df = pd.read_csv(occ / "train.csv")
    assert "visible" in df.columns
    assert (df["visible"] <= 1.0).all() and (df["visible"] >= 0.0).all()
    assert (df["visible"] < 1.0).any()

    dr = tmp_path / "drift"
    generate(str(dr), tracks=1, frames=8, val_sequences=1, seed=5, scenario="drift")
    seq = dr / "got10k" / "val" / "GOT-10k_Val_000000"
    cover = np.array([int(x) for x in (seq / "cover.label").read_text().split()])
    assert (cover == 8).all()


def test_trained_gate_artifact_discriminates():
    """Pins the SHIPPED trained gate (weights/fear_xs_feature_gate.npz,
    tools/train_feature_gate.py: holdout AUC 0.92): canonical clean-tracking
    observables must open the gate, canonical occlusion observables must
    close it. Measured 2026-08-19: clean 0.977, occluded 0.007."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "feartracker_tpu", "weights", "fear_xs_feature_gate.npz")
    if not os.path.exists(path):
        pytest.skip("trained feature gate artifact unavailable")
    params = load_gate(path)
    # [confidence, log1p(apce)/4, sim_static, sim_dyn, log_size_ratio,
    #  center_shift] — see models/gate.py OBS_FEATURES
    clean = [0.95, np.log1p(30.0) / 4, 0.85, 0.90, 0.0, 0.05]
    occluded = [0.55, np.log1p(5.0) / 4, 0.35, 0.40, -0.3, 0.8]
    rates = np.asarray(gate_rate(params, jnp.asarray([clean, occluded], jnp.float32)))
    assert rates[0] > 0.7, f"gate closed on clean tracking: {rates[0]:.3f}"
    assert rates[1] < 0.2, f"gate open under occlusion: {rates[1]:.3f}"
