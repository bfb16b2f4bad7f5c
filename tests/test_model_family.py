"""Model family: fear_tiny / fear_xs / fear_m / fear_l.

The reference ships exactly one architecture, FEAR-XS (its paper names
FEAR-M/FEAR-L but the repo releases neither specs nor weights — ref:
README.md:28). The framework's registry (`models/fbnet.TRUNKS`) adds scaled
variants in the same FBNet inverted-residual design space with identical
stride-16 geometry, so the whole stack — tracker, scan runtime, training,
export — is drop-in across the family. These tests lock that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.config.compose import load_config
from feartracker_tpu.convert.load import (
    PACKAGED_FEAR_XS,
    load_npz_variables,
    transfer_variables,
)
from feartracker_tpu.evaluate.flops import count_params
from feartracker_tpu.models.fbnet import TRUNKS
from feartracker_tpu.models.fear_net import FEARNet

FAMILY = ["fear_tiny", "fear_xs", "fear_m", "fear_l"]


def test_trunk_registry_names_and_geometry():
    assert set(FAMILY) <= set(TRUNKS)
    for name in ["fear_xs", "fear_m", "fear_l"]:
        blocks = TRUNKS[name]
        # stem is stride 2; deployable trunks add exactly three stride-2
        # blocks → output stride 16, the geometry every downstream component
        # (score 16×16, total_stride 16, template feats 8×8) assumes
        assert sum(1 for b in blocks if b.stride == 2) == 3, name
        for b in blocks:
            assert b.kernel in (3, 5) and b.stride in (1, 2)
            assert b.expansion >= 1 and b.out_channels > 0


def _init(name, adjust=32, towernum=1, img=64):
    model = FEARNet(
        trunk_blocks=TRUNKS[name], adjust_channels=adjust, towernum=towernum
    )
    template = jnp.zeros((1, img // 2, img // 2, 3), jnp.float32)
    search = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), (template, search))
    return model, variables, template, search


@pytest.mark.parametrize("name", ["fear_m", "fear_l"])
def test_family_forward_and_track_shapes(name):
    model, variables, template, search = _init(name)
    out = model.apply(variables, (template, search))
    score = search.shape[1] // 16
    assert out["TARGET_REGRESSION_LABEL_KEY"].shape == (1, score, score, 4)
    assert out["TARGET_CLASSIFICATION_KEY"].shape == (1, score, score, 1)
    feats = model.apply(variables, template, method=model.get_features)
    assert feats.shape == (1, score // 2, score // 2, 32)
    tracked = model.apply(variables, search, feats, method=model.track)
    assert tracked["TARGET_REGRESSION_LABEL_KEY"].shape == (1, score, score, 4)


def test_family_param_counts_are_ordered():
    counts = {}
    for name in FAMILY:
        _, variables, _, _ = _init(name)
        counts[name] = count_params(variables["params"])
    assert (
        counts["fear_tiny"]
        < counts["fear_xs"]
        < counts["fear_m"]
        < counts["fear_l"]
    ), counts


@pytest.mark.parametrize("name", ["fear_m", "fear_l"])
def test_family_config_groups_compose(name):
    cfg = load_config(config_name="fear_tracker", overrides=[f"model={name}"])
    assert cfg["model"]["name"] == name
    assert cfg["model"]["adjust_channels"] == 256
    assert cfg["model"]["img_size"] == 256
    assert name in TRUNKS  # the name the Trainer will look up


@pytest.mark.parametrize("name,towernum", [("fear_m", 2), ("fear_l", 3)])
def test_family_train_step_learns(name, towernum):
    """The family claim is "drop-in across training" — lock it with the real
    train step: the full FEAR_M/FEAR_L trunks (registered towernum) must
    compile through make_train_step and strictly reduce the FEAR loss over a
    few Adam steps on a fixed batch, with every parameter leaf moving
    (grad flow through the whole widened trunk; template_gate excepted —
    it only participates in forward_dual). Reduced 64²/32² geometry for CPU
    speed; the trunks and head wiring are the production ones."""
    import optax

    from feartracker_tpu.core import box_coder as bc
    from feartracker_tpu.train.step import create_train_state, make_train_step
    from feartracker_tpu.utils import constants as C

    model = FEARNet(trunk_blocks=TRUNKS[name], adjust_channels=32, towernum=towernum)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (2, 32, 32, 3), (2, 64, 64, 3)
    )
    spec = bc.BoxCoderSpec(score_size=4, total_stride=16, instance_size=64)
    step = jax.jit(make_train_step(model, tx, spec=spec))

    rng = np.random.RandomState(3)
    gt = np.stack(
        [rng.uniform(4, 20, 2), rng.uniform(4, 20, 2),
         rng.uniform(16, 36, 2), rng.uniform(16, 36, 2)], -1
    ).astype(np.float32)
    enc = bc.encode(jnp.asarray(gt), spec)
    batch = {
        C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: rng.rand(2, 32, 32, 3).astype(np.float32),
        C.TRACKER_TARGET_SEARCH_IMAGE_KEY: rng.rand(2, 64, 64, 3).astype(np.float32),
        C.TARGET_REGRESSION_LABEL_KEY: np.asarray(enc.regression_map),
        C.TARGET_CLASSIFICATION_KEY: np.asarray(enc.classification_label),
        C.TARGET_REGRESSION_WEIGHT_KEY: np.asarray(enc.classification_label)[..., 0],
        C.TRACKER_TARGET_BBOX_KEY: gt,
        C.TARGET_VISIBILITY_KEY: np.ones((2, 1), np.float32),
    }

    init_params = jax.tree.map(np.asarray, state.params)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

    flat_before = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, state.params)
    )[0]
    stuck = [
        jax.tree_util.keystr(path)
        for (path, before), (_, after) in zip(flat_before, flat_after)
        if "template_gate" not in jax.tree_util.keystr(path)
        and np.array_equal(before, after)
    ]
    assert not stuck, f"leaves without grad flow: {stuck}"


def test_warm_start_xs_into_fear_m_transfers_shared_prefix():
    """Non-strict transfer (ref analog: utils/torch.py:21-24) seeds fear_m
    from the recovered FEAR-XS weights: same-shape leaves (stem, and every
    depthwise/BN leaf whose width matches) copy over; widened leaves stay
    at init — no exception, full report."""
    loaded = load_npz_variables(PACKAGED_FEAR_XS)
    model = FEARNet(trunk_blocks=TRUNKS["fear_m"], adjust_channels=256, towernum=2)
    template = jnp.zeros((1, 32, 32, 3), jnp.float32)
    search = jnp.zeros((1, 64, 64, 3), jnp.float32)
    target = model.init(jax.random.PRNGKey(0), (template, search))
    target = jax.tree.map(np.asarray, target)
    merged, report = transfer_variables(loaded, target)
    # the 16-channel stem is shared across the family by construction
    assert "params/encoder/stem/conv/kernel" in report["transferred"]
    assert report["skipped_shape"], "widened leaves must be reported, not copied"
    np.testing.assert_array_equal(
        merged["params"]["encoder"]["stem"]["conv"]["kernel"],
        np.asarray(loaded["params"]["encoder"]["stem"]["conv"]["kernel"], np.float32),
    )


def test_family_export_roundtrip_fear_m(tmp_path):
    """The family claim is "drop-in across export" — lock it: a fear_m net
    exports to the two-graph StableHLO artifact (ref analog:
    evaluate/coreml_convert.py:13-57), reloads without model source, and
    matches the live model. Reduced geometry keeps the CPU compile cheap;
    the architecture — not the canvas size — is what this test pins."""
    from feartracker_tpu.convert.export import export_tracker, load_exported
    from feartracker_tpu.convert.fear_weights import imagenet_preprocess
    from feartracker_tpu.utils import constants as C

    model = FEARNet(trunk_blocks=TRUNKS["fear_m"], adjust_channels=32, towernum=2)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    paths = export_tracker(
        model, variables, str(tmp_path), template_size=32, instance_size=64,
        feat_size=2, channels=32, quantize=False,
    )
    rng = np.random.RandomState(1)
    template = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.float32)
    search = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)

    feats = load_exported(paths["tracker_init"])(template)
    assert np.asarray(feats).shape == (1, 2, 2, 32)
    bbox, cls = load_exported(paths["tracker"])(search, feats)
    assert np.asarray(bbox).shape == (1, 4, 4, 4)
    assert np.asarray(cls).shape == (1, 4, 4, 1)

    live_feats = model.apply(
        variables,
        jnp.asarray(imagenet_preprocess(template[0].astype(np.uint8)))[None],
        method=model.get_features,
    )
    np.testing.assert_allclose(np.asarray(feats), np.asarray(live_feats), atol=1e-4)

    # the TRACK graph must match numerically too, not just by shape — a
    # regression in its baked-in normalization or connector wiring would
    # otherwise pass (advisor r4)
    live = model.apply(
        variables,
        jnp.asarray(imagenet_preprocess(search[0].astype(np.uint8)))[None],
        live_feats,
        method=model.track,
    )
    np.testing.assert_allclose(
        np.asarray(bbox), np.asarray(live[C.TARGET_REGRESSION_LABEL_KEY]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cls), np.asarray(live[C.TARGET_CLASSIFICATION_KEY]), atol=1e-4
    )


def test_family_scan_runtime_tracks_fear_m():
    """The family claim is "drop-in across the scan runtime": ScanTracker
    with the fear_m trunk inits and tracks a 2-stream chunk at stride-16
    geometry, returning finite bboxes inside the frame."""
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.runtime import ScanTracker

    cfg = TrackerConfig(score_size=4, total_stride=16, instance_size=64,
                        template_size=32)
    model = FEARNet(trunk_blocks=TRUNKS["fear_m"], adjust_channels=32, towernum=2)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    chunk = rng.randint(0, 255, (3, 2, 96, 128, 3)).astype(np.uint8)
    bboxes = np.array([[40.0, 30.0, 30.0, 24.0], [20.0, 20.0, 40.0, 40.0]])

    tracker = ScanTracker(model, variables, cfg)
    state = tracker.init(frames, bboxes)
    state, out = tracker.track(state, chunk)
    bb = np.asarray(out["bbox"])
    assert bb.shape == (3, 2, 4)
    assert np.isfinite(bb).all()
    assert (bb[..., 2:] > 0).all()
    # "inside the frame" is the clamp_bbox contract — assert it, not just
    # finiteness (advisor r4): xywh within the 128×96 canvas
    assert (bb[..., 0] >= 0).all() and (bb[..., 1] >= 0).all()
    assert (bb[..., 0] + bb[..., 2] <= 128).all()
    assert (bb[..., 1] + bb[..., 3] <= 96).all()
