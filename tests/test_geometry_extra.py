"""Tests for the SiamFC-style crop utilities and geometry helpers added for
full L0 inventory parity (ref: utils/utils.py:97-368)."""

import numpy as np
import pytest

from feartracker_tpu.core import geometry as G
from feartracker_tpu.data.crops import get_crop_context, get_subwindow_tracking, rescale_crop


def test_bbox_from_cxy_wh_floors_at_zero():
    out = G.bbox_from_cxy_wh(np.array([5.0, 5.0]), np.array([20.0, 8.0]))
    assert out.tolist() == [0.0, 1.0, 20.0, 8.0]


def test_position_from_bbox():
    np.testing.assert_array_equal(G.position_from_bbox([10, 20, 30, 40]), [25, 40])


def test_get_side_with_context():
    # w=h=40, c=0.5: side = sqrt((40+40)(40+40)) = 80
    assert G.get_side_with_context([0, 0, 40, 40], 0.5) == 80


def test_transform_bbox_roundtrip():
    mapping = np.array([[2.0, 0, 10], [0, 2.0, 20]])
    fwd = G.transform_bbox([5, 5, 10, 10], mapping)
    np.testing.assert_array_equal(fwd, [20, 30, 20, 20])
    back = G.transform_bbox(fwd, mapping, inverse=True)
    # pinv float error + the reference's int truncation (utils/utils.py:348)
    # can round 4.9999→4: allow 1px
    np.testing.assert_allclose(back, [5, 5, 10, 10], atol=1)


def test_overlap_xywh_np_basic():
    a = np.array([[0.0, 0, 10, 10], [0, 0, 10, 10]])
    b = np.array([[0.0, 0, 10, 10], [5, 5, 10, 10]])
    ov = G.overlap_xywh_np(a, b)
    assert ov[0] == pytest.approx(1.0)
    assert ov[1] == pytest.approx(25 / 175)


def test_rescale_crop_mapping():
    img = np.zeros((50, 60, 3), np.uint8)
    img[10:20, 10:30] = 200
    crop, mapping = rescale_crop(img, np.array([10, 10, 20, 10]), 40)
    assert crop.shape == (40, 40, 3)
    assert crop.mean() > 150  # crop covers the bright region
    # mapping maps bbox origin to 0
    pt = mapping @ np.array([10.0, 10.0, 1.0])
    np.testing.assert_allclose(pt, [0, 0], atol=1e-6)


def test_get_crop_context_centers_bbox():
    img = np.full((100, 120, 3), 60, np.uint8)
    crop, bbox, mapping = get_crop_context(img, np.array([40, 40, 20, 20]), crop_size=128)
    assert crop.shape == (128, 128, 3)
    # bbox is centered in the crop (±2 px from int truncation)
    cx = bbox[0] + bbox[2] / 2
    cy = bbox[1] + bbox[3] / 2
    assert abs(cx - 64) <= 3 and abs(cy - 64) <= 3


def test_get_subwindow_tracking_pads_and_resizes():
    frame = np.full((40, 50, 3), 100, np.uint8)
    avg = np.array([7, 8, 9])
    patch, info = get_subwindow_tracking(frame, np.array([0, 0, 10, 10]), 32, 60, avg)
    assert patch.shape == (32, 32, 3)
    # bbox near origin with a 60px window → heavy padding with avg color
    assert (np.abs(patch[0, 0].astype(int) - avg) <= 2).all()
    assert info["pad_info"][2:] == [40, 50]
