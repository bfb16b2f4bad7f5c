"""Lightning-checkpoint import: a synthetic state dict with the reference's
exact module naming/ordering maps onto the Flax tree (shape-checked), and the
BN running stats land in batch_stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.convert.lightning import lightning_to_variables
from feartracker_tpu.models.fbnet import FEAR_XS_TRUNK
from feartracker_tpu.models.fear_net import FEARNet


def _synthetic_reference_state_dict(rng):
    """Build a state dict shaped/named/ordered like the reference FEARNet's
    (mobile_cv backbone + blocks.py head)."""
    sd = {}

    last_out = [0]

    def conv(name, out, inc, k, bias=False):
        sd[f"{name}.weight"] = rng.randn(out, inc, k, k).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.randn(out).astype(np.float32) * 0.05
        last_out[0] = out

    def bn(name, ch=None):
        ch = last_out[0] if ch is None else ch
        sd[f"{name}.weight"] = 1 + rng.randn(ch).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.randn(ch).astype(np.float32) * 0.05
        sd[f"{name}.running_mean"] = rng.randn(ch).astype(np.float32) * 0.05
        sd[f"{name}.running_var"] = 1 + np.abs(rng.randn(ch)).astype(np.float32) * 0.05
        sd[f"{name}.num_batches_tracked"] = np.asarray(100)

    # encoder (order = definition order; names approximate mobile_cv's)
    conv("encoder.model.backbone.stages.0.conv", 16, 3, 3)
    bn("encoder.model.backbone.stages.0.bn")
    in_ch = 16
    for i, spec in enumerate(FEAR_XS_TRUNK):
        base = f"encoder.model.backbone.stages.{i+1}"
        ch = in_ch
        if spec.expansion != 1:
            ch = in_ch * spec.expansion
            conv(f"{base}.pw.conv", ch, in_ch, 1)
            bn(f"{base}.pw.bn")
        conv(f"{base}.dw.conv", ch, 1, spec.kernel)
        bn(f"{base}.dw.bn")
        conv(f"{base}.pwl.conv", spec.out_channels, ch, 1)
        bn(f"{base}.pwl.bn")
        in_ch = spec.out_channels

    conv("neck.downsample.0", 256, 112, 1)
    bn("neck.downsample.1")

    for name in ("cls_encode", "reg_encode"):
        conv(f"connect_model.{name}.matrix11_s.0.depthwise", 256, 1, 3)
        conv(f"connect_model.{name}.matrix11_s.0.pointwise", 256, 256, 1)
        bn(f"connect_model.{name}.matrix11_s.1")
    for name in ("cls_dw", "reg_dw"):
        conv(f"connect_model.{name}.enc.0.depthwise", 320, 1, 3, bias=True)
        conv(f"connect_model.{name}.enc.0.pointwise", 256, 320, 1, bias=True)
        bn(f"connect_model.{name}.enc.1")
    for tower in ("bbox_tower", "cls_tower"):
        for i in range(2):
            conv(f"connect_model.{tower}.{3*i}.depthwise", 256, 1, 3, bias=True)
            conv(f"connect_model.{tower}.{3*i}.pointwise", 256, 256, 1, bias=True)
            bn(f"connect_model.{tower}.{3*i+1}")
    conv("connect_model.bbox_pred.depthwise", 256, 1, 3, bias=True)
    conv("connect_model.bbox_pred.pointwise", 4, 256, 1, bias=True)
    conv("connect_model.cls_pred.depthwise", 256, 1, 3, bias=True)
    conv("connect_model.cls_pred.pointwise", 1, 256, 1, bias=True)
    sd["connect_model.adjust"] = np.asarray([0.1], np.float32)
    sd["connect_model.bias"] = np.ones((1, 4, 1, 1), np.float32)
    return sd


def test_lightning_mapping_matches_flax_tree():
    rng = np.random.RandomState(0)
    sd = _synthetic_reference_state_dict(rng)
    variables = lightning_to_variables(sd)

    model = FEARNet()
    ref = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 256, 256, 3))),
        train=False,
    )

    def paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(paths(v, prefix + k + "/"))
            else:
                out[prefix + k] = tuple(np.shape(v))
        return out

    for coll in ("params", "batch_stats"):
        a = paths(jax.tree.map(np.asarray, ref[coll]))
        b = paths(variables[coll])
        assert a == b, (sorted(set(a) ^ set(b))[:6], coll)

    # the model runs with imported weights + real BN stats
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.zeros((1, 256, 256, 3)),
        jnp.zeros((1, 8, 8, 256)),
        method=model.track,
    )
    assert np.isfinite(np.asarray(out["TARGET_REGRESSION_LABEL_KEY"])).all()

    # spot check: a specific BN running stat landed where it belongs
    np.testing.assert_array_equal(
        variables["batch_stats"]["neck"]["downsample"]["bn"]["mean"],
        sd["neck.downsample.1.running_mean"],
    )
    # depthwise kernel layout: torch (C,1,k,k) → flax (k,k,1,C)
    np.testing.assert_array_equal(
        variables["params"]["connect_model"]["bbox_pred"]["dw"]["kernel"],
        sd["connect_model.bbox_pred.depthwise.weight"].transpose(2, 3, 1, 0),
    )


def test_lightning_mapping_rejects_wrong_arch():
    rng = np.random.RandomState(1)
    sd = _synthetic_reference_state_dict(rng)
    # corrupt a conv shape
    sd["neck.downsample.0.weight"] = rng.randn(128, 112, 1, 1).astype(np.float32)
    with pytest.raises(AssertionError):
        lightning_to_variables(sd)


def test_load_variables_format_dispatch(tmp_path, monkeypatch):
    """convert.load.load_variables routes by source format: directory ->
    Orbax, .ckpt -> Lightning, anything else -> CoreML recovery."""
    from feartracker_tpu.convert import load as L

    calls = []
    monkeypatch.setattr(
        "feartracker_tpu.train.checkpoint.load_orbax_variables",
        lambda p: calls.append(("orbax", p)) or {"params": {}, "batch_stats": {}},
    )
    monkeypatch.setattr(
        "feartracker_tpu.convert.lightning.load_from_lightning",
        lambda p, channels, towernum: calls.append(("ckpt", p, channels, towernum))
        or {"params": {}, "batch_stats": {}},
    )
    monkeypatch.setattr(
        "feartracker_tpu.convert.fear_weights.load_fear_xs",
        lambda p, channels, towernum: calls.append(("coreml", p, channels, towernum))
        or {"params": {}, "batch_stats": {}},
    )
    d = tmp_path / "ckpt_dir"
    d.mkdir()
    L.load_variables(str(d))
    L.load_variables("weights.ckpt", channels=48, towernum=1)
    L.load_variables("Tracker.mlmodel")
    assert [c[0] for c in calls] == ["orbax", "ckpt", "coreml"]
    assert calls[1][2:] == (48, 1)
