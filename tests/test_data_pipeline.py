"""Data pipeline tests on a synthetic CSV-annotated mini-dataset."""

import os

import cv2
import numpy as np
import pandas as pd
import pytest

from feartracker_tpu.data.dataset import ConcatDataset, SiameseTrackingDataset
from feartracker_tpu.data.loader import BatchLoader, collate
from feartracker_tpu.data.samplers import FrameSampler, TrackSampler
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


# -- FrameSampler (sampling.type: frame) ------------------------------------


@pytest.fixture(scope="module")
def csv_with_negatives(tmp_path_factory):
    """2 tracks x 10 frames, 2 negatives per track, 1 near-corner frame."""
    root = tmp_path_factory.mktemp("fsds")
    rng = np.random.RandomState(7)
    rows = []
    for track in range(2):
        color = rng.randint(60, 255, 3).tolist()
        for frame in range(10):
            img = np.full((240, 320, 3), 25, np.uint8)
            x = 30 + 6 * frame + 12 * track
            y = 40 + 5 * frame
            w, h = 70, 90
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            path = f"n{track}_f{frame}.jpg"
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
                    presence=0 if frame in (3, 7) else 1,
                    near_corner=1 if frame == 5 else 0,
                )
            )
    csv_path = root / "train.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return root, csv_path


def test_frame_sampler_enumerates_every_eligible_frame(csv_with_negatives):
    root, csv_path = csv_with_negatives
    s = FrameSampler(str(csv_path), negative_ratio=1.0, frame_offset=4, clip_range=True, seed=0)
    s.parse_samples()
    df = pd.read_csv(csv_path)
    eligible = df[(df["presence"] == 1) & (df["near_corner"] == 0)]
    # negative_ratio=1.0 keeps every negative; every eligible frame is one sample
    assert len(s) == len(eligible) == 14
    rng = np.random.RandomState(3)
    seen = []
    for i in range(len(s)):
        pair = s.extract_sample(i, rng=rng)  # rng keyword threads like TrackSampler
        t, srch = pair["template"], pair["search"]
        assert t["track_id"] == srch["track_id"]
        assert abs(t["frame_index"] - srch["frame_index"]) < 4
        assert t["presence"] == 1 and t["near_corner"] == 0
        seen.append((t["track_id"], t["frame_index"]))
    # deterministic walk: each eligible frame appears exactly once, in order
    assert seen == list(zip(eligible["track_id"], eligible["frame_index"]))
    # resample is a no-op for FrameSampler (no per-epoch redraw)
    s.resample()
    assert len(s) == 14
    assert s.extract_sample(0, rng=np.random.RandomState(0))["template"]["frame_index"] == seen[0][1]


def test_frame_sampler_negative_drop_formula(csv_with_negatives):
    root, csv_path = csv_with_negatives
    # 4 negatives / 20 rows = 0.2 negative fraction; target 0.05
    # drop = int((0.2 - 0.05) * 20) = 3 -> 17 rows survive, 1 negative kept
    s = FrameSampler(str(csv_path), negative_ratio=0.05, frame_offset=4, seed=0)
    s.parse_samples()
    assert len(s.data) == 17
    assert (s.data["presence"] == 0).sum() == 1
    # negative_ratio=0 drops every negative
    s0 = FrameSampler(str(csv_path), negative_ratio=0.0, frame_offset=4, seed=0)
    s0.parse_samples()
    assert (s0.data["presence"] == 0).sum() == 0


def test_frame_sampler_num_samples_caps_length(csv_with_negatives):
    root, csv_path = csv_with_negatives
    s = FrameSampler(str(csv_path), negative_ratio=1.0, frame_offset=4, num_samples=5, seed=0)
    s.parse_samples()
    assert len(s) == 5
    # num_samples=None (the default) means every eligible frame
    s_all = FrameSampler(str(csv_path), negative_ratio=1.0, frame_offset=4, seed=0)
    s_all.parse_samples()
    assert s_all.num_samples == 14


def _frame_config(root, csv_path):
    return {
        "root": str(root),
        "name": "synthetic",
        "sizes": dict(SIZES),
        "regression_weight_label_size": 16,
        "sampling": {
            "type": "frame",
            "data_path": str(csv_path),
            "negative_ratio": 1.0,
            "frame_offset": 4,
            "num_samples": None,
            "clip_range": True,
        },
    }


def test_frame_sampling_dataset_end_to_end(csv_with_negatives):
    root, csv_path = csv_with_negatives
    ds = SiameseTrackingDataset(_frame_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=1)
    assert len(ds) == 14
    item = ds[0]
    assert item[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY].shape == (128, 128, 3)
    assert item[C.TRACKER_TARGET_SEARCH_IMAGE_KEY].shape == (256, 256, 3)
    assert item[C.TARGET_REGRESSION_LABEL_KEY].shape == (16, 16, 4)
    # presence==0 searches must yield all-zero label maps
    zeros_seen = pos_seen = False
    for i in range(len(ds)):
        it = ds[i]
        if it[C.TARGET_VISIBILITY_KEY][0] == 0:
            zeros_seen = True
            assert it[C.TARGET_CLASSIFICATION_KEY].sum() == 0
            assert it[C.TARGET_REGRESSION_WEIGHT_KEY].sum() == 0
        else:
            pos_seen = True
    assert pos_seen  # eligible templates exist; most searches are positive


def test_frame_sampling_loader_determinism(csv_with_negatives):
    root, csv_path = csv_with_negatives

    def make_loader():
        ds = SiameseTrackingDataset(
            _frame_config(root, csv_path), {"score_size": 16, "total_stride": 16}, seed=2
        )
        return BatchLoader(ConcatDataset([ds]), batch_size=4, num_workers=2, seed=9)

    b0 = next(iter(make_loader()))
    b1 = next(iter(make_loader()))
    np.testing.assert_array_equal(
        b0[C.TRACKER_TARGET_SEARCH_IMAGE_KEY], b1[C.TRACKER_TARGET_SEARCH_IMAGE_KEY]
    )
    np.testing.assert_array_equal(
        b0[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY], b1[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY]
    )
    assert b0[C.TRACKER_TARGET_SEARCH_FILENAME_KEY] == b1[C.TRACKER_TARGET_SEARCH_FILENAME_KEY]


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
