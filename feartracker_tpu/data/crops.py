"""Host-side crop engine (numpy + cv2).

Exact functional port of the reference's context cropping
(ref: model_training/utils/utils.py:215-253 ``get_extended_crop``), used by
the host-facing tracker API and the data pipeline. The device-side
(jit-able) equivalent for the scan runtime is
:mod:`feartracker_tpu.ops.crop`.

The reference routed the resize through albumentations' ``A.Resize`` — a
cv2 INTER_LINEAR resize whose bbox transform is a pure linear rescale; both
are done directly here (albumentations is not available, and not needed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from feartracker_tpu.core.geometry import ensure_bbox_boundaries, extend_bbox


def rescale_crop(
    image: np.ndarray, bbox: np.ndarray, out_size: int, padding=(0, 0, 0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Affine crop+rescale with the returned mapping matrix
    (ref: utils/utils.py:256-274)."""
    a = (out_size - 1) / bbox[2]
    b = (out_size - 1) / bbox[3]
    mapping = np.array([[a, 0, -a * bbox[0]], [0, b, -b * bbox[1]]], np.float64)
    crop = cv2.warpAffine(
        image, mapping, (out_size, out_size), borderMode=cv2.BORDER_CONSTANT, borderValue=padding
    )
    return crop, mapping


def get_crop_context(
    image: np.ndarray,
    bbox: np.ndarray,
    context_amount: float = 0.5,
    bbox_side_ratio: float = 0.25,
    crop_size: int = 512,
    padding_value: Optional[np.ndarray] = None,
):
    """Centered context crop with a fixed bbox/crop side ratio
    (ref: utils/utils.py:292-320)."""
    from feartracker_tpu.core.geometry import (
        center_to_bbox,
        get_side_with_context,
        transform_bbox,
    )

    if padding_value is None:
        padding_value = np.mean(image, axis=(0, 1))
    side_size = int(crop_size * bbox_side_ratio)
    cx, cy = bbox[0] + bbox[2] / 2.0, bbox[1] + bbox[3] / 2.0
    s_z = get_side_with_context(bbox, context_amount)
    scale_z = side_size / s_z
    pad = (crop_size - side_size) / 2 / scale_z
    s_x = s_z + 2 * pad
    crop_image, mapping = rescale_crop(
        image, center_to_bbox([cx, cy, s_x, s_x]), crop_size, tuple(float(v) for v in np.asarray(padding_value).ravel())
    )
    crop_bbox = transform_bbox(bbox, mapping)
    return crop_image, crop_bbox, mapping


def get_subwindow_tracking(
    frame: np.ndarray,
    bbox: np.ndarray,
    template_size: int,
    original_sz: int,
    avg_chans: np.ndarray,
):
    """SiamFC-style square subwindow with average-channel padding
    (ref: utils/utils.py:114-172). Returns (patch, crop_info)."""
    from feartracker_tpu.core.geometry import position_from_bbox

    position = position_from_bbox(bbox)
    sz = original_sz
    im_h, im_w = frame.shape[:2]
    c = (original_sz + 1) / 2
    context_xmin = round(position[0] - c)
    context_xmax = context_xmin + sz - 1
    context_ymin = round(position[1] - c)
    context_ymax = context_ymin + sz - 1
    left_pad = int(max(0.0, -context_xmin))
    top_pad = int(max(0.0, -context_ymin))
    right_pad = int(max(0.0, context_xmax - im_w + 1))
    bottom_pad = int(max(0.0, context_ymax - im_h + 1))

    context_xmin += left_pad
    context_xmax += left_pad
    context_ymin += top_pad
    context_ymax += top_pad

    if any([top_pad, bottom_pad, left_pad, right_pad]):
        te = np.zeros((im_h + top_pad + bottom_pad, im_w + left_pad + right_pad, frame.shape[2]), np.uint8)
        te[top_pad : top_pad + im_h, left_pad : left_pad + im_w] = frame
        te[:top_pad, left_pad : left_pad + im_w] = avg_chans
        te[im_h + top_pad :, left_pad : left_pad + im_w] = avg_chans
        te[:, :left_pad] = avg_chans
        te[:, im_w + left_pad :] = avg_chans
        patch = te[int(context_ymin) : int(context_ymax + 1), int(context_xmin) : int(context_xmax + 1)]
    else:
        patch = frame[int(context_ymin) : int(context_ymax + 1), int(context_xmin) : int(context_xmax + 1)]

    if template_size != original_sz:
        patch = cv2.resize(patch, (template_size, template_size))
    crop_info = {
        "crop_cords": [context_xmin, context_xmax, context_ymin, context_ymax],
        "pad_info": [top_pad, left_pad, im_h, im_w],
    }
    return patch, crop_info


def get_extended_crop(
    image: np.ndarray,
    bbox: np.ndarray,
    crop_size: int,
    offset: float,
    padding_value: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extend ``bbox`` by ``offset`` per side, pad out-of-frame regions with
    ``padding_value`` (mean color by default), resize to
    ``crop_size``×``crop_size``.

    Returns (crop_image, crop_bbox_float, context_window) where
    ``context_window`` is the integer frame-space window the crop covers —
    the "mapping" used to rescale predictions back to frame coordinates
    (ref: fear_tracker.py:53-63).
    """
    if padding_value is None:
        padding_value = np.mean(image, axis=(0, 1))
    context = extend_bbox(np.asarray(bbox), offset)
    pad_left, pad_top = max(-int(context[0]), 0), max(-int(context[1]), 0)
    pad_right = max(int(context[0] + context[2]) - image.shape[1], 0)
    pad_bottom = max(int(context[1] + context[3]) - image.shape[0], 0)

    crop = image[
        context[1] + pad_top : context[1] + context[3] - pad_bottom,
        context[0] + pad_left : context[0] + context[2] - pad_right,
    ]
    padded = cv2.copyMakeBorder(
        crop,
        pad_top,
        pad_bottom,
        pad_left,
        pad_right,
        cv2.BORDER_CONSTANT,
        value=tuple(float(v) for v in np.asarray(padding_value).ravel()),
    )
    padded_bbox = ensure_bbox_boundaries(
        np.array([bbox[0] - context[0], bbox[1] - context[1], bbox[2], bbox[3]]),
        img_shape=padded.shape[:2],
    )
    resized = cv2.resize(padded, (crop_size, crop_size), interpolation=cv2.INTER_LINEAR)
    scale_x = crop_size / padded.shape[1]
    scale_y = crop_size / padded.shape[0]
    out_bbox = padded_bbox.astype(np.float64) * np.array([scale_x, scale_y, scale_x, scale_y])
    return resized, out_bbox, context
