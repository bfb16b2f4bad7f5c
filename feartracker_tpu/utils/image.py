"""Shared host-side image helpers."""

from __future__ import annotations

import numpy as np

from feartracker_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


def normalize_imagenet_np(image: np.ndarray) -> np.ndarray:
    """[0,255] RGB (uint8 or float) → ImageNet-normalized float32 — the one
    host implementation (device twin: ops.crop.normalize_imagenet;
    ref: base_tracker.py:69-81, aug.py:145-151)."""
    mean = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std = np.asarray(IMAGENET_STD, np.float32) * 255.0
    return (image.astype(np.float32) - mean) / std
