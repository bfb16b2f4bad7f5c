import numpy as np
import pytest

from feartracker_tpu.core import geometry as G


def test_extend_bbox_scalar_offset():
    # 100x100 box grown by 0.1 per side -> 120x120 shifted by -10
    out = G.extend_bbox(np.array([50, 60, 100, 100]), 0.1)
    assert out.tolist() == [40, 50, 120, 120]
    assert out.dtype == np.int32


def test_extend_bbox_tuple_offsets():
    out = G.extend_bbox(np.array([10, 10, 100, 200]), (0.1, 0.2, 0.3, 0.4))
    # left=0.1,right=0.2,top=0.3,bottom=0.4
    assert out.tolist() == [10 - 10, 10 - 60, int(100 * 1.3), int(200 * 1.7)]


def test_ensure_bbox_boundaries_clips():
    out = G.ensure_bbox_boundaries(np.array([-10, -5, 50, 50]), img_shape=(30, 40))
    x1, y1, w, h = out
    assert (x1, y1) == (0, 0)
    assert (w, h) == (40, 30)


def test_clamp_bbox_enforces_min_side():
    out = G.clamp_bbox(np.array([100, 100, 1, 1]), shape=(200, 200))
    assert out[2] >= 3 and out[3] >= 3


def test_clamp_bbox_min_side_at_edge():
    # tiny box at right edge: x shifts left so the 3px side stays inside
    out = G.clamp_bbox(np.array([199, 50, 1, 10]), shape=(200, 200))
    x, y, w, h = out
    assert w == 3 and x + w <= 200


def test_python2round_half_away_from_zero():
    assert G.python2round(0.5) == 1
    assert G.python2round(1.5) == 2
    assert G.python2round(2.5) == 3
    assert G.python2round(-0.5) == -1


def test_limit_and_squared_size():
    assert G.limit(0.25) == 4.0
    assert G.limit(4.0) == 4.0
    # squared_size(4,4): pad=4 -> sqrt(8*8)=8
    assert G.squared_size(4.0, 4.0) == pytest.approx(8.0)


def test_bbox_iou_identity():
    assert G.bbox_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)


def test_rescale_crop_bbox_roundtrip():
    # crop covers frame region [100, 50, 512, 512]; instance 256 -> scale 2
    padded = np.array([100, 50, 512, 512])
    out = G.rescale_crop_bbox(np.array([64.0, 64.0, 32.0, 32.0]), padded, 256)
    assert out == [100 + 128, 50 + 128, 64, 64]
