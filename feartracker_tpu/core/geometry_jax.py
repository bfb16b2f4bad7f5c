"""Device-side (jit-traceable) bbox algebra.

jnp counterparts of :mod:`feartracker_tpu.core.geometry` used inside the
jitted tracking step, where the reference did the same math on the host in
numpy/python between device calls (ref: base_tracker.py:83-90,
fear_tracker.py:63-64, utils/utils.py:60-71,202-212). Rounding mimics the
reference: python3 ``round`` is round-half-even → ``jnp.round``; ``.astype(int)``
truncation → ``jnp.trunc``.

All functions are batched over a leading axis and operate in float32; boxes
stay float on device (integerness is preserved exactly by float32 for any
realistic frame size).
"""

from __future__ import annotations

import jax.numpy as jnp


def ensure_bbox_boundaries(bbox: jnp.ndarray, img_hw) -> jnp.ndarray:
    """Clip xywh into an (h, w) image with int truncation semantics
    (ref: utils/utils.py:60-71)."""
    h, w = img_hw
    x1 = jnp.clip(bbox[..., 0], 0, w)
    y1 = jnp.clip(bbox[..., 1], 0, h)
    x2 = jnp.clip(x1 + bbox[..., 2], 0, w)
    y2 = jnp.clip(y1 + bbox[..., 3], 0, h)
    out = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    return jnp.trunc(out)


def clamp_bbox(bbox: jnp.ndarray, img_hw, min_side: float = 3.0) -> jnp.ndarray:
    """Clip into the image and enforce a min side (ref: utils/utils.py:202-212)."""
    h, w = img_hw
    b = ensure_bbox_boundaries(bbox, img_hw)
    x, y, bw, bh = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    small_w = bw < min_side
    x = jnp.where(small_w, x - jnp.maximum(0.0, x + min_side - w), x)
    bw = jnp.where(small_w, min_side, bw)
    small_h = bh < min_side
    y = jnp.where(small_h, y - jnp.maximum(0.0, y + min_side - h), y)
    bh = jnp.where(small_h, min_side, bh)
    return jnp.stack([x, y, bw, bh], axis=-1)


def extend_bbox(bbox: jnp.ndarray, offset: float) -> jnp.ndarray:
    """Grow by a fraction per side, truncating to integers
    (ref: utils/utils.py:29-57)."""
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    out = jnp.stack(
        [x - w * offset, y - h * offset, w * (1.0 + 2.0 * offset), h * (1.0 + 2.0 * offset)],
        axis=-1,
    )
    return jnp.trunc(out)


def rescale_crop_bbox(
    bbox: jnp.ndarray, padded_box: jnp.ndarray, instance_size: int, min_side: float = 3.0
) -> jnp.ndarray:
    """Map a crop-space bbox back to frame space with banker's rounding
    (ref: base_tracker.py:83-90)."""
    w_scale = padded_box[..., 2] / instance_size
    h_scale = padded_box[..., 3] / instance_size
    x = jnp.round(bbox[..., 0] * w_scale + padded_box[..., 0])
    y = jnp.round(bbox[..., 1] * h_scale + padded_box[..., 1])
    w = jnp.maximum(min_side, jnp.round(bbox[..., 2] * w_scale))
    h = jnp.maximum(min_side, jnp.round(bbox[..., 3] * h_scale))
    return jnp.stack([x, y, w, h], axis=-1)


def box_iou_xywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of xywh boxes, standard convention (no +1), batched."""
    ax1, ay1 = a[..., 0], a[..., 1]
    ax2, ay2 = ax1 + a[..., 2], ay1 + a[..., 3]
    bx1, by1 = b[..., 0], b[..., 1]
    bx2, by2 = bx1 + b[..., 2], by1 + b[..., 3]
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return inter / jnp.maximum(union, 1e-9)
