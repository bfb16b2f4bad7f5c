"""Host-facing online tracker: the ``initialize``/``update`` API of the
reference demo (ref: model_training/tracker/fear_tracker.py, demo_video.py).

Host work is limited to the cv2 context crop and integer bbox bookkeeping —
everything from normalization through penalty-window decode runs in a single
jitted device function (one upload, one tiny download per frame; the
reference crossed the boundary twice with a full score-map download,
SURVEY.md §3.1). For maximum throughput use the fully on-device scan runtime
in :mod:`feartracker_tpu.tracker.runtime` instead.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.core import postprocess as pp
from feartracker_tpu.core.geometry import clamp_bbox, rescale_crop_bbox
from feartracker_tpu.data.crops import get_extended_crop
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.utils.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
)


def _normalize(img: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (img.astype(jnp.float32) - mean) / std


class FEARTracker:
    """Single-stream online tracker with the reference's public API."""

    def __init__(self, model: FEARNet, variables: Dict[str, Any], config: TrackerConfig = TrackerConfig()):
        self.model = model
        self.variables = variables
        self.config = config
        self._template_features: Optional[jnp.ndarray] = None
        self.bbox: Optional[np.ndarray] = None
        self.mean_color: Optional[np.ndarray] = None
        self.prev_size: Optional[np.ndarray] = None
        self.paths: deque = deque(maxlen=10)

        # variables are an explicit jit argument: weights stay device
        # arrays (not baked-in constants), so swapping weights — e.g. the
        # in-training validation tracker — needs no recompilation.
        @jax.jit
        def _features(variables, crop_u8: jnp.ndarray) -> jnp.ndarray:
            x = _normalize(crop_u8)[None]
            return self.model.apply(variables, x, method=self.model.get_features)

        @jax.jit
        def _step(variables, crop_u8: jnp.ndarray, feats: jnp.ndarray, prev_size: jnp.ndarray):
            x = _normalize(crop_u8)[None]
            out = self.model.apply(variables, x, feats, method=self.model.track)
            res = pp.postprocess(
                out[TARGET_CLASSIFICATION_KEY],
                out[TARGET_REGRESSION_LABEL_KEY],
                self.config.postprocess,
                prev_size=prev_size[None],
            )
            return res.bbox[0], res.confidence[0]

        self._features_fn = partial(_features, self.variables)
        self._step_fn = partial(_step, self.variables)
        self._features_raw = _features
        self._step_raw = _step

    def set_variables(self, variables: Dict[str, Any]) -> None:
        """Swap model weights (no recompile); resets the cached template."""
        self.variables = variables
        self._features_fn = partial(self._features_raw, variables)
        self._step_fn = partial(self._step_raw, variables)
        self.reset()

    def reset(self) -> None:
        self._template_features = None

    def initialize(self, image: np.ndarray, rect: np.ndarray) -> None:
        """(ref: fear_tracker.py:17-44)"""
        rect = clamp_bbox(np.asarray(rect), image.shape)
        self.bbox = rect
        self.paths = deque([rect], maxlen=10)
        self.mean_color = np.mean(image, axis=(0, 1))
        template_crop, _, _ = get_extended_crop(
            image=image,
            bbox=rect,
            offset=self.config.template_bbox_offset,
            crop_size=self.config.template_size,
        )
        self._template_features = self._features_fn(jnp.asarray(template_crop))

    def update(self, image: np.ndarray) -> Dict[str, Any]:
        """(ref: fear_tracker.py:46-67)"""
        assert self._template_features is not None, "call initialize() first"
        search_crop, search_bbox, window = get_extended_crop(
            image=image,
            bbox=self.bbox,
            crop_size=self.config.instance_size,
            offset=self.config.search_context,
            padding_value=self.mean_color,
        )
        self.prev_size = search_bbox[2:]
        crop_bbox, confidence = self._step_fn(
            jnp.asarray(search_crop),
            self._template_features,
            jnp.asarray(self.prev_size, jnp.float32),
        )
        pred = rescale_crop_bbox(np.asarray(crop_bbox), window, self.config.instance_size)
        pred = clamp_bbox(pred, image.shape)
        self.bbox = pred
        self.paths.append(pred)
        return {"bbox": pred, "confidence": float(confidence)}
