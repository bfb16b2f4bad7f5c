"""Data pipeline tests on a synthetic CSV-annotated mini-dataset."""

import os

import cv2
import numpy as np
import pandas as pd
import pytest

from feartracker_tpu.data.dataset import ConcatDataset, SiameseTrackingDataset
from feartracker_tpu.data.loader import BatchLoader, collate
from feartracker_tpu.data.samplers import TrackSampler
from feartracker_tpu.utils import constants as C

SIZES = {
    "search_image_size": 256,
    "template_image_size": 128,
    "search_context": 2,
    "template_bbox_offset": 0.2,
    "search_image_shift": 48,
    "search_image_scale": 0.35,
    "context_range": 3,
}


@pytest.fixture(scope="module")
def csv_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    rows = []
    for track in range(3):
        color = rng.randint(60, 255, 3).tolist()
        for frame in range(8):
            img = np.full((240, 320, 3), 30, np.uint8)
            x = 40 + 8 * frame + 10 * track
            y = 50 + 4 * frame
            w, h = 60, 80
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            path = f"t{track}_f{frame}.jpg"
            cv2.imwrite(str(root / path), img)
            rows.append(
                dict(
                    sequence_id=f"seq{track}",
                    track_id=f"track{track}",
                    frame_index=frame,
                    img_path=path,
                    bbox=str([x, y, w, h]),
                    frame_shape=str([320, 240]),
                    dataset="synthetic",
                    presence=1,
                    near_corner=0,
                )
            )
    # a few negatives
    for i in range(4):
        rows[i * 5]["presence"] = rows[i * 5]["presence"]
    df = pd.DataFrame(rows)
    csv_path = root / "train.csv"
    df.to_csv(csv_path, index=False)
    return root, csv_path


def _config(root, csv_path, num_samples=12):
    return {
        "root": str(root),
        "name": "synthetic",
        "sizes": dict(SIZES),
        "regression_weight_label_size": 16,
        "sampling": {
            "type": "track",
            "data_path": str(csv_path),
            "negative_ratio": 0.0,
            "frame_offset": 5,
            "num_samples": num_samples,
            "clip_range": True,
        },
    }


def test_sampler_clip_range(csv_dataset):
    root, csv_path = csv_dataset
    s = TrackSampler(str(csv_path), negative_ratio=0, frame_offset=3, num_samples=10, clip_range=True, seed=0)
    s.parse_samples()
    for i in range(len(s)):
        pair = s.extract_sample(i)
        assert pair["template"]["track_id"] == pair["search"]["track_id"]
        assert abs(pair["template"]["frame_index"] - pair["search"]["frame_index"]) < 3


def test_dataset_item_shapes_and_labels(csv_dataset):
    root, csv_path = csv_dataset
    ds = SiameseTrackingDataset(_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=1)
    assert len(ds) == 12
    item = ds[0]
    assert item[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY].shape == (128, 128, 3)
    assert item[C.TRACKER_TARGET_SEARCH_IMAGE_KEY].shape == (256, 256, 3)
    assert item[C.TARGET_REGRESSION_LABEL_KEY].shape == (16, 16, 4)
    assert item[C.TARGET_CLASSIFICATION_KEY].shape == (16, 16, 1)
    assert item[C.TARGET_REGRESSION_WEIGHT_KEY].shape == (16, 16)
    # normalized images should be roughly centered
    assert abs(item[C.TRACKER_TARGET_SEARCH_IMAGE_KEY].mean()) < 3.0

    # label consistency: positive cls cells lie inside the bbox on the grid
    bbox = item[C.TRACKER_TARGET_BBOX_KEY]
    cls = item[C.TARGET_CLASSIFICATION_KEY][..., 0]
    if cls.sum() > 0:
        rows, cols = np.nonzero(cls)
        gx = (cols - 8) * 16 + 128
        gy = (rows - 8) * 16 + 128
        assert (gx > bbox[0]).all() and (gx < bbox[0] + bbox[2]).all()
        assert (gy > bbox[1]).all() and (gy < bbox[1] + bbox[3]).all()


def test_dataset_resample_changes_epoch(csv_dataset):
    root, csv_path = csv_dataset
    ds = SiameseTrackingDataset(_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=2)
    first = ds.item_sampler.epoch_data["img_path"].tolist()
    ds.resample()
    second = ds.item_sampler.epoch_data["img_path"].tolist()
    assert len(first) == len(second) == 12
    # track-balanced: all tracks represented
    assert ds.item_sampler.epoch_data["track_id"].nunique() == 3


def test_batch_loader(csv_dataset):
    root, csv_path = csv_dataset
    ds = SiameseTrackingDataset(_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=3)
    loader = BatchLoader(ConcatDataset([ds]), batch_size=4, num_workers=2, seed=5)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b[C.TRACKER_TARGET_SEARCH_IMAGE_KEY].shape == (4, 256, 256, 3)
    assert b[C.TARGET_VISIBILITY_KEY].shape == (4, 1)
    assert isinstance(b[C.DATASET_NAME_KEY], list) or b[C.DATASET_NAME_KEY].shape == (4,)
    assert len(b[C.TRACKER_TARGET_SEARCH_FILENAME_KEY]) == 4


def test_host_sharding_partitions_data(csv_dataset):
    root, csv_path = csv_dataset
    ds = SiameseTrackingDataset(_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=3)
    cat = ConcatDataset([ds])
    l0 = BatchLoader(cat, batch_size=2, num_workers=1, seed=7, host_id=0, num_hosts=2)
    l1 = BatchLoader(cat, batch_size=2, num_workers=1, seed=7, host_id=1, num_hosts=2)
    i0 = l0._indices()
    i1 = l1._indices()
    assert set(i0).isdisjoint(set(i1))
    assert len(set(i0) | set(i1)) == len(cat)


def test_dynamic_template_emits_aux(csv_dataset):
    root, csv_path = csv_dataset
    cfg = _config(root, csv_path)
    cfg["dynamic_template"] = True
    ds = SiameseTrackingDataset(cfg, {"score_size": 16, "total_stride": 16}, seed=4)
    item = ds[0]
    assert item[C.TRACKER_TARGET_AUX_IMAGE_KEY].shape == (128, 128, 3)
    # loader stacks it
    from feartracker_tpu.data.loader import BatchLoader

    b = next(iter(BatchLoader(ConcatDataset([ds]), batch_size=4, num_workers=2)))
    assert b[C.TRACKER_TARGET_AUX_IMAGE_KEY].shape == (4, 128, 128, 3)
