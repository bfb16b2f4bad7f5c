"""Device-side augmentation (data/device_augs.py): geometric twins match the
host pipeline exactly; the staged train path runs end-to-end and learns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.data import device_augs as D
from feartracker_tpu.data.augmentations import BBoxCropWithOffsets
from feartracker_tpu.data.labels import get_regression_weight_label
from feartracker_tpu.ops.crop import crop_resize_mm


def test_affine_grid_matches_host_warp():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 96, 3), np.uint8)
    window = [12.0, 20.0, 60.0, 48.0]
    host = BBoxCropWithOffsets.affine_crop(img, window, 64).astype(np.float32)
    dev = np.asarray(
        crop_resize_mm(jnp.asarray(img), jnp.asarray(window, jnp.float32), 64,
                       jnp.zeros(3, jnp.float32), grid="affine")
    )
    # cv2 rounds to uint8; our float path doesn't — within 1 level
    assert np.abs(host - dev).max() <= 1.0


def test_affine_grid_constant_border():
    img = jnp.full((40, 40, 3), 200.0)
    # window extends past the image: outside samples must be 0 (warpAffine
    # BORDER_CONSTANT 0), not edge-replicated
    out = np.asarray(
        crop_resize_mm(img, jnp.asarray([30.0, 30.0, 20.0, 20.0]), 20,
                       jnp.zeros(3, jnp.float32), grid="affine")
    )
    assert out[0, 0].max() == 200.0
    assert out[-1, -1].max() == 0.0


def test_transform_bbox_matches_host():
    aug = BBoxCropWithOffsets(bbox_crop=[0, 0, 1, 1], scale=0, shift=0, crop_size=128)
    for bbox, crop in [
        ([40, 50, 30, 20], [20.0, 30.0, 200.0, 160.0]),
        ([10, 10, 30, 20], [20.0, 15.0, 100.0, 90.0]),  # negative new_x branch
        ([150, 140, 80, 60], [20.0, 15.0, 100.0, 90.0]),  # clipped at far edge
    ]:
        host = np.asarray(aug._transform_bbox(np.asarray(bbox, np.float64), crop))
        dev = np.asarray(
            D._transform_bbox(jnp.asarray(bbox, jnp.float32), jnp.asarray(crop), 128)
        )
        np.testing.assert_array_equal(dev, host.astype(np.float32))


def test_modified_crop_within_bounds():
    cfg = D.DeviceAugConfig(search_size=64, scale=0.2, shift=8.0)
    for i in range(16):
        w = np.asarray(D._modified_crop(jax.random.PRNGKey(i), cfg, 128))
        assert w[0] >= 0 and w[1] >= 0
        assert w[0] + w[2] <= 128 and w[1] + w[3] <= 128
        assert 40 <= w[2] <= 90  # 64·(1±0.2) ± shifts/clipping slack


def test_regression_weight_matches_host():
    rng = np.random.RandomState(1)
    boxes = np.stack(
        [np.array([rng.randint(0, 200), rng.randint(0, 200), rng.randint(4, 60), rng.randint(4, 60)])
         for _ in range(8)]
    ).astype(np.float32)
    dev = np.asarray(D.regression_weight_batch(jnp.asarray(boxes), 256, 16))
    for i in range(8):
        host = get_regression_weight_label(boxes[i].astype(int), 256, 16)
        np.testing.assert_array_equal(dev[i], host)


def test_augment_batch_outputs_consistent():
    from feartracker_tpu.utils import constants as C

    rng = np.random.RandomState(2)
    B, s = 4, 64
    batch = {
        D.STAGED_SEARCH_KEY: rng.randint(0, 255, (B, 2 * s, 2 * s, 3), np.uint8),
        D.STAGED_SEARCH_BBOX_KEY: np.tile(np.array([[48, 52, 30, 26]], np.float32), (B, 1)),
        C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: rng.randint(0, 255, (B, 32, 32, 3), np.uint8),
        C.TARGET_VISIBILITY_KEY: np.array([[1], [1], [1], [0]], np.float32),
    }
    cfg = D.DeviceAugConfig(search_size=s, scale=0.2, shift=8.0, grid_size=8, total_stride=8)
    out = jax.jit(lambda b, k: D.augment_batch(b, k, cfg))(batch, jax.random.PRNGKey(0))

    assert out[C.TRACKER_TARGET_SEARCH_IMAGE_KEY].shape == (B, s, s, 3)
    assert out[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY].shape == (B, 32, 32, 3)
    assert out[C.TARGET_REGRESSION_LABEL_KEY].shape == (B, 8, 8, 4)
    assert out[C.TARGET_CLASSIFICATION_KEY].shape == (B, 8, 8, 1)
    assert out[C.TARGET_REGRESSION_WEIGHT_KEY].shape == (B, 8, 8)
    # normalized images (ImageNet stats): roughly zero-centered, few units wide
    x = np.asarray(out[C.TRACKER_TARGET_SEARCH_IMAGE_KEY])
    assert np.abs(x).max() < 5.0
    # presence gating: sample 3 is absent -> all-zero maps (ref siam_dataset.py:49-52)
    assert np.asarray(out[C.TARGET_CLASSIFICATION_KEY][3]).max() == 0.0
    assert np.asarray(out[C.TARGET_REGRESSION_WEIGHT_KEY][3]).max() == 0.0
    # present samples keep a positive region
    assert np.asarray(out[C.TARGET_CLASSIFICATION_KEY][0]).max() == 1.0
    # bbox stays inside the crop
    bb = np.asarray(out[C.TRACKER_TARGET_BBOX_KEY])
    assert (bb[:, 0] >= 0).all() and (bb[:, 0] + bb[:, 2] <= s).all()


def test_trainer_device_augs_end_to_end(tmp_path_factory):
    import pandas as pd

    from feartracker_tpu.train.loop import Trainer
    from tests.test_trainer_integration import _make_track_images

    root = str(tmp_path_factory.mktemp("devaug"))
    rows = _make_track_images(root, n_tracks=2, n_frames=6)
    csv_path = f"{root}/train.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    cfg = {
        "platform": "", "num_devices": 1, "seed": 0,
        "device_augs": True,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {"score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32},
        "optimizer": {"name": "adam", "lr": 1e-3},
        "batch_size": 4, "num_workers": 1, "max_epochs": 1,
        "experiment": {"folder": f"{root}/exp", "name": "DEVAUG"},
        "train": {"datasets": [{
            "name": "synthetic", "root": root,
            "sizes": {"search_image_size": 64, "template_image_size": 32,
                      "search_context": 2, "template_bbox_offset": 0.2,
                      "search_image_shift": 8, "search_image_scale": 0.2,
                      "context_range": 1},
            "regression_weight_label_size": 8,
            "sampling": {"type": "track", "data_path": csv_path, "negative_ratio": 0,
                         "frame_offset": 4, "num_samples": 8, "clip_range": True},
        }]},
        "val": {"datasets": []},
    }
    trainer = Trainer(cfg)
    trainer.setup_data()
    # dataset switched to staged mode
    item = trainer.train_dataset[0]
    assert item[D.STAGED_SEARCH_KEY].dtype == np.uint8
    assert item[D.STAGED_SEARCH_KEY].shape == (128, 128, 3)
    trainer.setup_state(0)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"]) and int(trainer.state.step) == 2


def test_device_augs_with_dual_template(tmp_path_factory):
    """device_augs + dual_template compose: the staged batch carries the aux
    uint8 crop, augment_batch normalizes it, the step trains forward_dual."""
    import pandas as pd

    from feartracker_tpu.train.loop import Trainer
    from feartracker_tpu.utils import constants as C
    from tests.test_trainer_integration import _make_track_images

    root = str(tmp_path_factory.mktemp("devaug_dual"))
    rows = _make_track_images(root, n_tracks=2, n_frames=6)
    pd.DataFrame(rows).to_csv(f"{root}/train.csv", index=False)
    cfg = {
        "platform": "", "num_devices": 1, "seed": 0,
        "device_augs": True, "dual_template": True,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {"score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32},
        "optimizer": {"name": "adam", "lr": 1e-3},
        "batch_size": 4, "num_workers": 1, "max_epochs": 1,
        "experiment": {"folder": f"{root}/exp", "name": "DUALDEV"},
        "train": {"datasets": [{
            "name": "synthetic", "root": root,
            "sizes": {"search_image_size": 64, "template_image_size": 32,
                      "search_context": 2, "template_bbox_offset": 0.2,
                      "search_image_shift": 8, "search_image_scale": 0.2,
                      "context_range": 1},
            "regression_weight_label_size": 8,
            "sampling": {"type": "track", "data_path": f"{root}/train.csv", "negative_ratio": 0,
                         "frame_offset": 4, "num_samples": 8, "clip_range": True},
        }]},
        "val": {"datasets": []},
    }
    trainer = Trainer(cfg)
    trainer.setup_data()
    item = trainer.train_dataset[0]
    assert item[C.TRACKER_TARGET_AUX_IMAGE_KEY].dtype == np.uint8
    trainer.setup_state(0)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])


def test_device_augs_geometry_mismatch_rejected(tmp_path_factory):
    """Two train datasets with different aug geometry must fail loudly."""
    import pandas as pd

    from feartracker_tpu.train.loop import Trainer
    from tests.test_trainer_integration import _make_track_images

    root = str(tmp_path_factory.mktemp("devaug_mismatch"))
    rows = _make_track_images(root, n_tracks=1, n_frames=4)
    pd.DataFrame(rows).to_csv(f"{root}/train.csv", index=False)
    sizes = {"search_image_size": 64, "template_image_size": 32,
             "search_context": 2, "template_bbox_offset": 0.2,
             "search_image_shift": 8, "search_image_scale": 0.2, "context_range": 1}
    ds = {
        "name": "a", "root": root, "sizes": sizes,
        "regression_weight_label_size": 8,
        "sampling": {"type": "track", "data_path": f"{root}/train.csv", "negative_ratio": 0,
                     "frame_offset": 4, "num_samples": 4, "clip_range": True},
    }
    cfg = {
        "platform": "", "num_devices": 1, "seed": 0, "device_augs": True,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {"score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32},
        "optimizer": {"name": "adam", "lr": 1e-3},
        "batch_size": 4, "num_workers": 1, "max_epochs": 1,
        "experiment": {"folder": f"{root}/exp", "name": "MISMATCH"},
        "train": {"datasets": [ds, {**ds, "name": "b", "sizes": {**sizes, "search_image_shift": 16}}]},
        "val": {"datasets": []},
    }
    trainer = Trainer(cfg)
    with pytest.raises(ValueError, match="identical aug geometry"):
        trainer.setup_data()


def test_device_augs_on_mesh(tmp_path_factory):
    """Staged batches shard over the 8-device mesh and the in-step
    augmentation decorrelates across shards (shard_map path compiles/runs)."""
    import pandas as pd

    from feartracker_tpu.train.loop import Trainer
    from tests.test_trainer_integration import _make_track_images

    root = str(tmp_path_factory.mktemp("devaug_mesh"))
    rows = _make_track_images(root, n_tracks=2, n_frames=6)
    pd.DataFrame(rows).to_csv(f"{root}/train.csv", index=False)
    cfg = {
        "platform": "", "num_devices": 8, "sync_bn": True, "seed": 0,
        "device_augs": True,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {"score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32},
        "optimizer": {"name": "adam", "lr": 1e-3},
        "batch_size": 8, "num_workers": 1, "max_epochs": 1,
        "experiment": {"folder": f"{root}/exp", "name": "DEVAUG_MESH"},
        "train": {"datasets": [{
            "name": "synthetic", "root": root,
            "sizes": {"search_image_size": 64, "template_image_size": 32,
                      "search_context": 2, "template_bbox_offset": 0.2,
                      "search_image_shift": 8, "search_image_scale": 0.2,
                      "context_range": 1},
            "regression_weight_label_size": 8,
            "sampling": {"type": "track", "data_path": f"{root}/train.csv", "negative_ratio": 0,
                         "frame_offset": 4, "num_samples": 8, "clip_range": True},
        }]},
        "val": {"datasets": []},
    }
    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.setup_state(0)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
