"""Training step tests: loss values vs a numpy oracle; the real shard_map DP
path on an 8-device CPU mesh (the fake-backend capability the reference lacks,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.core import box_coder as bc
from feartracker_tpu.models.fbnet import IRBlockSpec
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from feartracker_tpu.train import loss as L
from feartracker_tpu.train.optim import build_optimizer, get_learning_rate
from feartracker_tpu.train.step import TrainState, create_train_state, make_train_step
from feartracker_tpu.utils import constants as C

# a 3-block toy trunk so tests compile in seconds
TOY_TRUNK = (
    IRBlockSpec(1, 3, 1, 8),
    IRBlockSpec(2, 3, 2, 12),
    IRBlockSpec(2, 5, 2, 16),
)


def tiny_model(**kw):
    # stride 16 total: stem(2) * block1(2) * block2(2) * extra stride? stem 2,
    # blocks 1,2,2 → output stride 8; use 64/32 inputs → 8x8 template, 4x4...
    # instance grid must be 16x16 for the default spec; instead use a spec-free
    # check with score sizes derived from shapes.
    return FEARNet(trunk_blocks=TOY_TRUNK, adjust_channels=32, towernum=1, **kw)


def _toy_batch(rng, B, spec):
    t = rng.rand(B, 32, 32, 3).astype(np.float32)
    s = rng.rand(B, 64, 64, 3).astype(np.float32)
    gt = np.stack([rng.uniform(4, 20, B), rng.uniform(4, 20, B), rng.uniform(8, 30, B), rng.uniform(8, 30, B)], -1).astype(np.float32)
    enc = bc.encode(jnp.asarray(gt), spec)
    return {
        C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: t,
        C.TRACKER_TARGET_SEARCH_IMAGE_KEY: s,
        C.TARGET_REGRESSION_LABEL_KEY: np.asarray(enc.regression_map),
        C.TARGET_CLASSIFICATION_KEY: np.asarray(enc.classification_label),
        C.TARGET_REGRESSION_WEIGHT_KEY: np.asarray(enc.classification_label)[..., 0],
        C.TRACKER_TARGET_BBOX_KEY: gt,
        C.TARGET_VISIBILITY_KEY: np.ones((B, 1), np.float32),
    }


SPEC = bc.BoxCoderSpec(score_size=8, total_stride=8, instance_size=64)


def test_loss_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, H, W = 2, 8, 8
    pred_reg = np.abs(rng.randn(B, H, W, 4)).astype(np.float32) * 10 + 1
    tgt_reg = np.abs(rng.randn(B, H, W, 4)).astype(np.float32) * 10 + 1
    logits = rng.randn(B, H, W, 1).astype(np.float32)
    labels = (rng.rand(B, H, W, 1) > 0.7).astype(np.float32)
    weight = labels[..., 0]

    out = {C.TARGET_REGRESSION_LABEL_KEY: jnp.asarray(pred_reg), C.TARGET_CLASSIFICATION_KEY: jnp.asarray(logits)}
    tgt = {
        C.TARGET_REGRESSION_LABEL_KEY: jnp.asarray(tgt_reg),
        C.TARGET_CLASSIFICATION_KEY: jnp.asarray(labels),
        C.TARGET_REGRESSION_WEIGHT_KEY: jnp.asarray(weight),
    }
    losses = L.fear_loss(out, tgt)

    # numpy oracle, independent transliteration of loss.py math
    ta = (tgt_reg[..., 0] + tgt_reg[..., 2]) * (tgt_reg[..., 1] + tgt_reg[..., 3])
    pa = (pred_reg[..., 0] + pred_reg[..., 2]) * (pred_reg[..., 1] + pred_reg[..., 3])
    wi = np.minimum(pred_reg[..., 0], tgt_reg[..., 0]) + np.minimum(pred_reg[..., 2], tgt_reg[..., 2])
    hi = np.minimum(pred_reg[..., 3], tgt_reg[..., 3]) + np.minimum(pred_reg[..., 1], tgt_reg[..., 1])
    iou = (wi * hi + 1) / (ta + pa - wi * hi + 1)
    reg_ref = (1 - iou)[weight > 0].mean()

    x, z = logits.ravel(), labels.ravel()
    bce = np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))
    cls_ref = 0.5 * bce[z == 1].mean() + 0.5 * bce[z == 0].mean()

    np.testing.assert_allclose(float(losses[C.TARGET_REGRESSION_LABEL_KEY]), reg_ref, rtol=1e-5)
    np.testing.assert_allclose(float(losses[C.TARGET_CLASSIFICATION_KEY]), cls_ref, rtol=1e-5)


def test_loss_no_positives_is_finite():
    z = jnp.zeros((1, 8, 8, 1))
    out = {C.TARGET_REGRESSION_LABEL_KEY: jnp.ones((1, 8, 8, 4)), C.TARGET_CLASSIFICATION_KEY: z}
    tgt = {
        C.TARGET_REGRESSION_LABEL_KEY: jnp.ones((1, 8, 8, 4)),
        C.TARGET_CLASSIFICATION_KEY: z,
        C.TARGET_REGRESSION_WEIGHT_KEY: jnp.zeros((1, 8, 8)),
    }
    losses = L.fear_loss(out, tgt)
    assert np.isfinite(float(losses[C.TARGET_REGRESSION_LABEL_KEY]))
    assert float(losses[C.TARGET_REGRESSION_LABEL_KEY]) == 0.0


def test_single_device_train_step_decreases_loss():
    model = tiny_model()
    tx = build_optimizer({"name": "adam", "lr": 1e-3})
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))
    step = make_train_step(model, tx, spec=SPEC)
    rng = np.random.RandomState(1)
    batch = _toy_batch(rng, 8, SPEC)
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11


def test_data_parallel_step_matches_single_device():
    """With identical data on every shard, DP mean-of-means == global mean, so
    the 8-device shard_map step (grad pmean + sync-BN) must reproduce the
    single-device step bit-for-bit up to float reassociation."""
    mesh = make_mesh(8)
    model_dp = tiny_model(bn_axis_name=DATA_AXIS)
    model_sd = tiny_model()
    # SGD: adam would amplify O(1e-7) reassociation noise in near-zero grads
    # into +/-lr sign flips, making exact comparison ill-conditioned
    tx = build_optimizer({"name": "sgd", "lr": 1e-3})
    state0 = create_train_state(model_sd, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))

    rng = np.random.RandomState(2)
    shard = _toy_batch(rng, 2, SPEC)
    batch = {k: np.concatenate([v] * 8, axis=0) for k, v in shard.items()}

    sd_step = make_train_step(model_sd, tx, spec=SPEC)
    dp_step = make_train_step(model_dp, tx, spec=SPEC, mesh=mesh)

    sd_state, sd_m = sd_step(state0, shard)  # single shard == global content
    dp_state, dp_m = dp_step(state0, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(dp_m["loss"]), float(sd_m["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(dp_m["box_iou"]), float(sd_m["box_iou"]), rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(sd_state.params), jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # sync-BN: running stats must match the global-batch stats
    for a, b in zip(jax.tree.leaves(sd_state.batch_stats), jax.tree.leaves(dp_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_data_parallel_heterogeneous_shards_train():
    """Heterogeneous shards: loss semantics are mean-of-per-shard-means (the
    reference's DDP semantics, SURVEY.md §2.2) with cross-shard sync-BN; the
    step must stay finite, keep params replicated, and reduce loss when
    iterated."""
    mesh = make_mesh(8)
    model_dp = tiny_model(bn_axis_name=DATA_AXIS)
    tx = build_optimizer({"name": "adam", "lr": 1e-3})
    state = create_train_state(model_dp, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))

    rng = np.random.RandomState(3)
    batch = shard_batch(mesh, _toy_batch(rng, 16, SPEC))
    dp_step = make_train_step(model_dp, tx, spec=SPEC, mesh=mesh)

    state, m0 = dp_step(state, batch)
    assert np.isfinite(float(m0["loss"]))
    assert 0.0 <= float(m0["box_iou"]) <= 1.0
    for _ in range(6):
        state, m = dp_step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    # params remain a single logical (replicated) array
    p = jax.tree.leaves(state.params)[0]
    assert p.sharding.is_fully_replicated


def test_plateau_scheduler_reduces_lr():
    from feartracker_tpu.train.optim import PlateauScheduler

    s = PlateauScheduler(mode="max", factor=0.5, patience=2, min_lr=1e-6)
    lr = 1e-3
    lr = s.update(0.5, lr)
    assert lr == 1e-3
    for _ in range(2):
        lr = s.update(0.4, lr)
    assert lr == 1e-3  # patience not yet exceeded
    lr = s.update(0.4, lr)
    assert lr == 5e-4  # reduced after patience+1 bad epochs


def test_optimizer_lr_inject_roundtrip():
    tx = build_optimizer({"name": "adam", "lr": 1e-4})
    params = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    assert get_learning_rate(opt_state) == pytest.approx(1e-4)


def test_lr_helpers_reject_plain_optimizer_state():
    """An optimizer built without inject_hyperparams gets a clear ValueError,
    not an AttributeError on NoneType."""
    import optax

    opt_state = optax.sgd(1e-3).init({"w": jnp.ones(2)})
    with pytest.raises(ValueError, match="no injected hyperparams"):
        get_learning_rate(opt_state)


def test_gradient_clip_by_global_norm():
    """gradient_clip_val (ref trainer.py:59) clips before the update rule;
    the lr helpers still find the injected lr through the clip wrapper."""
    from feartracker_tpu.train.optim import set_learning_rate

    tx = build_optimizer({"name": "sgd", "lr": 1.0, "gradient_clip_val": 1.0})
    params = {"w": jnp.zeros(4)}
    opt_state = tx.init(params)
    big_grad = {"w": jnp.full(4, 100.0)}
    updates, opt_state = tx.update(big_grad, opt_state, params)
    # ||update|| = lr * clip = 1.0, not lr * ||grad|| = 200
    assert float(jnp.linalg.norm(updates["w"])) == pytest.approx(1.0, rel=1e-5)

    assert get_learning_rate(opt_state) == pytest.approx(1.0)
    opt_state = set_learning_rate(opt_state, 0.5)
    assert get_learning_rate(opt_state) == pytest.approx(0.5)

    # clip off by default: the same gradient passes through unscaled
    tx0 = build_optimizer({"name": "sgd", "lr": 1.0})
    st0 = tx0.init(params)
    up0, _ = tx0.update(big_grad, st0, params)
    assert float(jnp.linalg.norm(up0["w"])) == pytest.approx(200.0, rel=1e-5)


def test_multistep_scan_matches_sequential():
    """make_train_multistep(step, k) == k sequential step() calls: same
    final params/opt state, per-step metrics stacked on a leading k axis."""
    from feartracker_tpu.train.step import make_train_multistep, stack_batches

    model = tiny_model()
    # SGD: linear updates keep the comparison at float-noise level (Adam's
    # rsqrt(v)+eps normalization amplifies benign scan-vs-standalone XLA
    # fusion differences in the first steps)
    tx = build_optimizer({"name": "sgd", "lr": 1e-3})
    step = make_train_step(model, tx, spec=SPEC)
    rng = np.random.RandomState(9)
    batches = [_toy_batch(rng, 4, SPEC) for _ in range(3)]

    s_seq = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))
    seq_losses = []
    for b in batches:
        s_seq, m = step(s_seq, b)
        seq_losses.append(float(m["loss"]))

    s_multi = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))
    multi = make_train_multistep(step, 3)
    s_multi, metrics = multi(s_multi, stack_batches(batches))

    assert int(s_multi.step) == 3
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_multi.params), jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    import pytest

    with pytest.raises(ValueError):
        make_train_multistep(step, 0)


def test_dual_template_train_step():
    """forward_dual trains end to end and the learned template gate moves."""
    model = tiny_model()
    tx = build_optimizer({"name": "adam", "lr": 1e-3})
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))
    step = make_train_step(model, tx, spec=SPEC, dual_template=True)
    rng = np.random.RandomState(4)
    batch = _toy_batch(rng, 8, SPEC)
    batch[C.TRACKER_TARGET_AUX_IMAGE_KEY] = rng.rand(8, 32, 32, 3).astype(np.float32)
    gate0 = float(np.asarray(state.params["template_gate"])[0])
    state, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert float(np.asarray(state.params["template_gate"])[0]) != gate0


def test_non_finite_batch_is_skipped_entirely():
    """The round-5 flagship robustness contract: a NaN batch must leave
    params, Adam moments AND BatchNorm running stats untouched, and the next
    finite batch must train normally (the round-4 flagship run NaN'd at epoch
    8 and never recovered — benchmarks/raw_round5/flagship.log)."""
    model = tiny_model()
    tx = build_optimizer(
        {"name": "adam", "lr": 1e-3, "gradient_clip_val": 1.0, "skip_non_finite": 10}
    )
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3)
    )
    step = make_train_step(model, tx, spec=SPEC, guard_non_finite=True)

    rng = np.random.RandomState(3)
    good = _toy_batch(rng, 2, SPEC)
    bad = {k: np.array(v) for k, v in good.items()}
    bad[C.TRACKER_TARGET_SEARCH_IMAGE_KEY] = np.full_like(
        bad[C.TRACKER_TARGET_SEARCH_IMAGE_KEY], np.nan
    )

    state1, out1 = step(state, bad)
    assert not np.isfinite(float(out1["loss"]))  # the loss itself reports NaN
    # ... but nothing in the carried state absorbed it
    for a, b in zip(
        jax.tree_util.tree_leaves((state.params, state.batch_stats)),
        jax.tree_util.tree_leaves((state1.params, state1.batch_stats)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.step) == int(state.step) + 1

    state2, out2 = step(state1, good)
    assert np.isfinite(float(out2["loss"]))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.params),
            jax.tree_util.tree_leaves(state2.params),
        )
    )
    for leaf in jax.tree_util.tree_leaves((state2.params, state2.batch_stats)):
        assert np.all(np.isfinite(np.asarray(leaf)))
