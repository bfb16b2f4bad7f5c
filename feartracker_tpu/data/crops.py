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
