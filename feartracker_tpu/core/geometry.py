"""Host-side bounding-box algebra (numpy).

Functional re-implementation of the geometry layer of the reference tracker
(/root/reference/model_training/utils/utils.py). These run on the host: they
feed the data pipeline and the host-facing tracker API. Device-side (jit-able)
equivalents live in :mod:`feartracker_tpu.core.geometry_jax`.

All bboxes are ``[x, y, w, h]`` (top-left + size) unless stated otherwise.
Integer-rounding choices deliberately match the reference so that bbox
trajectories can be compared bit-for-bit (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np

BBox = Union[Sequence, np.ndarray]


def bbox_iou(a: BBox, b: BBox) -> float:
    """Pairwise IoU of two xywh boxes with the reference's +1 pixel convention
    (ref: utils/utils.py:15-26 ``get_iou``)."""
    x1, y1, w1, h1 = a
    x2, y2, w2, h2 = b
    xa, ya = max(x1, x2), max(y1, y2)
    xb, yb = min(x1 + w1, x2 + w2), min(y1 + h1, y2 + h2)
    inter = max(xb - xa + 1, 0) * max(yb - ya + 1, 0)
    area_a = (w1 + 1) * (h1 + 1)
    area_b = (w2 + 1) * (h2 + 1)
    return inter / (area_a + area_b - inter)


def extend_bbox(bbox: BBox, offset: Union[Tuple[float, ...], float] = 0.1) -> np.ndarray:
    """Grow a bbox by ``offset`` fractions of its own size on each side and
    truncate to int32 (ref: utils/utils.py:29-57). May produce negative x/y;
    pair with :func:`ensure_bbox_boundaries`."""
    x, y, w, h = bbox
    if isinstance(offset, tuple):
        if len(offset) == 4:
            left, right, top, bottom = offset
        else:
            left = right = offset[0]
            top = bottom = offset[1]
    else:
        left = right = top = bottom = offset
    return np.array(
        [x - w * left, y - h * top, w * (1.0 + right + left), h * (1.0 + top + bottom)]
    ).astype("int32")


def ensure_bbox_boundaries(bbox: BBox, img_shape: Tuple[int, int]) -> np.ndarray:
    """Clip a bbox into an ``(h, w)`` image (ref: utils/utils.py:60-71)."""
    x1, y1, w, h = bbox
    x1, y1 = min(max(0, x1), img_shape[1]), min(max(0, y1), img_shape[0])
    x2, y2 = min(max(0, x1 + w), img_shape[1]), min(max(0, y1 + h), img_shape[0])
    return np.array([x1, y1, x2 - x1, y2 - y1]).astype("int32")


def clamp_bbox(bbox: BBox, shape: Tuple[int, int], min_side: int = 3) -> np.ndarray:
    """Clip into the image and enforce a minimum side length
    (ref: utils/utils.py:202-212)."""
    x, y, w, h = ensure_bbox_boundaries(bbox, img_shape=shape)
    img_h, img_w = shape[0], shape[1]
    if w < min_side:
        w = min_side
        x -= max(0, x + w - img_w)
    if h < min_side:
        h = min_side
        y -= max(0, y + h - img_h)
    return np.array([x, y, w, h])


def handle_empty_bbox(bbox: np.ndarray, min_bbox: int = 3) -> np.ndarray:
    """Enforce a minimum bbox size in place (ref: dataset/utils.py:149-152)."""
    bbox[2] = max(bbox[2], min_bbox)
    bbox[3] = max(bbox[3], min_bbox)
    return bbox


def limit(radius):
    """max(r, 1/r) — used by the scale/ratio penalties
    (ref: utils/utils.py:74-77)."""
    return np.maximum(radius, 1.0 / radius)


def squared_size(w, h):
    """SiamFC context size sqrt((w+p)(h+p)), p=(w+h)/2
    (ref: utils/utils.py:80-85)."""
    pad = (w + h) * 0.5
    return np.sqrt((w + pad) * (h + pad))


def python2round(x: float) -> float:
    """Round-half-away-from-zero, as python2 did (ref: utils/utils.py:88-94).

    Python3 / numpy round half-to-even; trackers of the SiamFC lineage
    traditionally use py2 semantics for crop side computation.
    """
    if round(x + 1) - round(x) != 1:
        return x + abs(x) / x * 0.5
    return round(x)


def overlap_xywh_np(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Vectorized elementwise IoU of (N, 4) xywh arrays, standard convention
    (no +1) — the numpy twin of geometry_jax.box_iou_xywh, shared by the
    evaluation harnesses."""
    x1 = np.maximum(pred[..., 0], gt[..., 0])
    y1 = np.maximum(pred[..., 1], gt[..., 1])
    x2 = np.minimum(pred[..., 0] + pred[..., 2], gt[..., 0] + gt[..., 2])
    y2 = np.minimum(pred[..., 1] + pred[..., 3], gt[..., 1] + gt[..., 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    union = pred[..., 2] * pred[..., 3] + gt[..., 2] * gt[..., 3] - inter
    return inter / np.maximum(union, 1e-9)


def bbox_to_center(bbox: BBox) -> np.ndarray:
    """xywh → xc,yc,w,h, truncated to int (ref: dataset/utils.py:113-120)."""
    return np.array([bbox[0] + bbox[2] / 2, bbox[1] + bbox[3] / 2, bbox[2], bbox[3]]).astype("int")


def center_to_bbox(center: BBox) -> np.ndarray:
    """xc,yc,w,h → xywh, truncated to int (ref: dataset/utils.py:9-16)."""
    return np.array(
        [center[0] - center[2] / 2, center[1] - center[3] / 2, center[2], center[3]]
    ).astype("int")


def xywh_to_xyxy(bbox: np.ndarray) -> np.ndarray:
    out = np.asarray(bbox, dtype=np.float64).copy()
    out[..., 2] = out[..., 0] + out[..., 2]
    out[..., 3] = out[..., 1] + out[..., 3]
    return out


def crop_context_window(bbox: BBox, context: float) -> Tuple[np.ndarray, int]:
    """The integer context window that :func:`extend_bbox` selects for a
    search crop, plus derived paddings. Convenience for the device crop engine.
    """
    ctx = extend_bbox(np.asarray(bbox), context)
    return ctx, int(ctx[2])


def bbox_from_cxy_wh(position: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Center+size → xywh with the reference's x/y floor at 0
    (ref: utils/utils.py:97-105)."""
    return np.array(
        [
            max(0.0, position[0] - size[0] / 2),
            max(0.0, position[1] - size[1] / 2),
            float(size[0]),
            float(size[1]),
        ]
    )


def position_from_bbox(bbox: BBox) -> np.ndarray:
    """xywh → center point (ref: utils/utils.py:108-111)."""
    x, y, w, h = bbox
    return np.array([x + w / 2, y + h / 2])


def get_side_with_context(bbox: BBox, context_amount: float) -> float:
    """SiamFC context side: sqrt((w+p)(h+p)), p = c·(w+h)
    (ref: utils/utils.py:277-289)."""
    w, h = bbox[2], bbox[3]
    wc = w + context_amount * (w + h)
    hc = h + context_amount * (w + h)
    return max(round(np.sqrt(wc * hc)), 1)


def get_points(bbox: BBox) -> np.ndarray:
    """bbox corners as cv2.transform-ready points (ref: utils/utils.py:351-368)."""
    return (
        np.array(
            [
                [bbox[0], bbox[1]],
                [bbox[0], bbox[1] + bbox[3]],
                [bbox[0] + bbox[2], bbox[1] + bbox[3]],
                [bbox[0] + bbox[2], bbox[1]],
            ]
        )
        .reshape((-1, 1, 2))
        .astype("float64")
    )


def transform_bbox(bbox: BBox, mapping: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Apply (or invert) a 2×3 affine mapping to a bbox
    (ref: utils/utils.py:333-348)."""
    import cv2

    if inverse:
        full = np.concatenate([mapping, np.array([[0.0, 0.0, 1.0]])], axis=0)
        mapping = np.linalg.pinv(full)[:2]
    pts = cv2.transform(get_points(bbox), mapping)
    x, y = pts[0, 0]
    w, h = pts[2, 0] - pts[0, 0]
    return np.array([x, y, w, h]).astype("int")


def rescale_crop_bbox(bbox: np.ndarray, padded_box: np.ndarray, instance_size: int, min_side: int = 3) -> list:
    """Map a bbox predicted inside a search crop back to frame coordinates
    (ref: base_tracker.py:83-90 ``_rescale_bbox``).

    Uses banker's rounding (python3 ``round``) exactly as the reference does.
    """
    w_scale = padded_box[2] / instance_size
    h_scale = padded_box[3] / instance_size
    out = [
        round(float(bbox[0]) * w_scale + padded_box[0]),
        round(float(bbox[1]) * h_scale + padded_box[1]),
        max(min_side, round(float(bbox[2]) * w_scale)),
        max(min_side, round(float(bbox[3]) * h_scale)),
    ]
    return list(map(int, out))
