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


def test_trainer_rejects_incompatible_source(tmp_path):
    """A source sharing no leaf with the target fails loudly instead of
    silently training from scratch."""
    import pytest as _pytest

    from feartracker_tpu.train.loop import Trainer

    bogus = str(tmp_path / "bogus.npz")
    np.savez(bogus, **{"params/nonsense/kernel": np.ones((3, 3), np.float32)})
    tr = Trainer(_tiny_trainer_config(bogus))
    with _pytest.raises(ValueError, match="no weights transferred"):
        tr.setup_state()
