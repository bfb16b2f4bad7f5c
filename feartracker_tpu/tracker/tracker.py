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
from feartracker_tpu.ops.crop import normalize_imagenet
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.utils.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
)


def _normalize(img: jnp.ndarray) -> jnp.ndarray:
    return normalize_imagenet(img.astype(jnp.float32))


class FEARTracker:
    """Single-stream online tracker with the reference's public API.

    ``native_preprocess=True`` routes the per-frame crop through the fused
    C++ engine (feartracker_tpu/native) instead of the cv2 chain — one pass,
    no intermediate padded image, normalization included (numerically matches
    the device crop op; the cv2 path matches the reference bit-for-bit).
    """

    def __init__(
        self,
        model: FEARNet,
        variables: Dict[str, Any],
        config: TrackerConfig = TrackerConfig(),
        native_preprocess: bool = False,
        recover_context: float = 0.0,
        recover_threshold: float = None,
        dynamic_template: bool = False,
        update_threshold: float = 0.85,
        update_rate: float = 0.1,
        update_interval: int = 1,
    ):
        self.model = model
        self.variables = variables
        self.config = config
        # zoom-out re-acquisition (host twin of ScanTracker's recover_context,
        # measured +0.195 AO on occlusion content — BENCHMARKS.md): after a
        # frame scoring below recover_threshold, crop the next search at the
        # wider context. 0.0 = disabled. The crop happens host-side, so no
        # recompile is involved.
        if recover_context < 0:
            raise ValueError(f"recover_context must be >= 0, got {recover_context}")
        self.recover_context = float(recover_context)
        self.recover_threshold = (
            config.confidence_threshold if recover_threshold is None
            else float(recover_threshold)
        )
        self.last_confidence: float = 1.0
        # host twin of ScanTracker's dual-template EMA update (runtime.py
        # refresh(): candidate = template-geometry crop features at the
        # predicted bbox; dyn <- (1-r)·dyn + r·cand when confidence clears
        # update_threshold, every update_interval-th frame). Lets the VOT
        # supervised protocol — a host sequential protocol — evaluate the
        # dual template under re-inits (VERDICT r4 #3).
        self.dynamic_template = bool(dynamic_template)
        self.update_threshold = float(update_threshold)
        self.update_rate = float(update_rate)
        if update_interval < 1:
            raise ValueError(f"update_interval must be >= 1, got {update_interval}")
        self.update_interval = int(update_interval)
        self._dyn_features: Optional[jnp.ndarray] = None
        self._frame_count = 0
        if dynamic_template and native_preprocess:
            raise ValueError(
                "dynamic_template is implemented on the cv2 preprocess path; "
                "combine it with native_preprocess=False"
            )
        if native_preprocess:
            from feartracker_tpu import native

            if not native.available():
                raise RuntimeError("native crop engine unavailable (no C++ toolchain?)")
        self.native_preprocess = native_preprocess
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

        # dual-template variant: the dynamic template rides the cls branch
        # via the update hook (ref: blocks.py:174-179)
        @jax.jit
        def _step_dual(variables, crop_u8: jnp.ndarray, feats: jnp.ndarray,
                       update_feats: jnp.ndarray, prev_size: jnp.ndarray):
            x = _normalize(crop_u8)[None]
            out = self.model.apply(
                variables, x, feats, update_feats, method=self.model.track
            )
            res = pp.postprocess(
                out[TARGET_CLASSIFICATION_KEY],
                out[TARGET_REGRESSION_LABEL_KEY],
                self.config.postprocess,
                prev_size=prev_size[None],
            )
            return res.bbox[0], res.confidence[0]

        # pre-normalized variants for the native C++ preprocessing path
        @jax.jit
        def _features_pre(variables, crop_norm: jnp.ndarray) -> jnp.ndarray:
            return self.model.apply(variables, crop_norm[None], method=self.model.get_features)

        @jax.jit
        def _step_pre(variables, crop_norm: jnp.ndarray, feats: jnp.ndarray, prev_size: jnp.ndarray):
            out = self.model.apply(variables, crop_norm[None], feats, method=self.model.track)
            res = pp.postprocess(
                out[TARGET_CLASSIFICATION_KEY],
                out[TARGET_REGRESSION_LABEL_KEY],
                self.config.postprocess,
                prev_size=prev_size[None],
            )
            return res.bbox[0], res.confidence[0]

        self._features_fn = partial(_features, self.variables)
        self._step_fn = partial(_step, self.variables)
        self._step_dual_fn = partial(_step_dual, self.variables)
        self._features_pre_fn = partial(_features_pre, self.variables)
        self._step_pre_fn = partial(_step_pre, self.variables)
        self._features_raw = _features
        self._step_raw = _step
        self._step_dual_raw = _step_dual
        self._features_pre_raw = _features_pre
        self._step_pre_raw = _step_pre

    def set_variables(self, variables: Dict[str, Any]) -> None:
        """Swap model weights (no recompile); resets the cached template."""
        self.variables = variables
        self._features_fn = partial(self._features_raw, variables)
        self._step_fn = partial(self._step_raw, variables)
        self._step_dual_fn = partial(self._step_dual_raw, variables)
        self._features_pre_fn = partial(self._features_pre_raw, variables)
        self._step_pre_fn = partial(self._step_pre_raw, variables)
        self.reset()

    def _native_crop(self, image: np.ndarray, bbox: np.ndarray, offset: float, out_size: int, pad_color):
        """Fused C++ crop+normalize; returns (normalized crop, window)."""
        from feartracker_tpu import native
        from feartracker_tpu.core.geometry import extend_bbox

        window = extend_bbox(np.asarray(bbox), offset).astype(np.float32)
        mean = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
        std = np.asarray(IMAGENET_STD, np.float32) * 255.0
        crop = native.crop_resize_normalize(
            image, window, out_size, np.asarray(pad_color, np.float32), mean, std
        )
        return crop, window.astype(np.int64)

    def reset(self) -> None:
        self._template_features = None
        self._dyn_features = None
        self._frame_count = 0

    def initialize(self, image: np.ndarray, rect: np.ndarray) -> None:
        """(ref: fear_tracker.py:17-44)"""
        rect = clamp_bbox(np.asarray(rect), image.shape)
        self.bbox = rect
        self.paths = deque([rect], maxlen=10)
        self.last_confidence = 1.0
        self.mean_color = np.mean(image, axis=(0, 1))
        if self.native_preprocess:
            crop_norm, _ = self._native_crop(
                image, rect, self.config.template_bbox_offset,
                self.config.template_size, self.mean_color,
            )
            self._template_features = self._features_pre_fn(jnp.asarray(crop_norm))
        else:
            template_crop, _, _ = get_extended_crop(
                image=image,
                bbox=rect,
                offset=self.config.template_bbox_offset,
                crop_size=self.config.template_size,
            )
            self._template_features = self._features_fn(jnp.asarray(template_crop))
        self._dyn_features = self._template_features
        self._frame_count = 0

    def update(self, image: np.ndarray) -> Dict[str, Any]:
        """(ref: fear_tracker.py:46-67)"""
        assert self._template_features is not None, "call initialize() first"
        context = self.config.search_context
        if self.recover_context and self.last_confidence < self.recover_threshold:
            context = self.recover_context
        if self.native_preprocess:
            crop_norm, window = self._native_crop(
                image, self.bbox, context,
                self.config.instance_size, self.mean_color,
            )
            from feartracker_tpu.core.geometry import ensure_bbox_boundaries

            padded_bbox = ensure_bbox_boundaries(
                np.array([self.bbox[0] - window[0], self.bbox[1] - window[1], self.bbox[2], self.bbox[3]]),
                img_shape=(int(window[3]), int(window[2])),
            )
            scale = self.config.instance_size / window[2:4].astype(np.float64)
            self.prev_size = padded_bbox[2:] * scale
            crop_bbox, confidence = self._step_pre_fn(
                jnp.asarray(crop_norm),
                self._template_features,
                jnp.asarray(self.prev_size, jnp.float32),
            )
        else:
            search_crop, search_bbox, window = get_extended_crop(
                image=image,
                bbox=self.bbox,
                crop_size=self.config.instance_size,
                offset=context,
                padding_value=self.mean_color,
            )
            self.prev_size = search_bbox[2:]
            if self.dynamic_template:
                crop_bbox, confidence = self._step_dual_fn(
                    jnp.asarray(search_crop),
                    self._template_features,
                    self._dyn_features,
                    jnp.asarray(self.prev_size, jnp.float32),
                )
            else:
                crop_bbox, confidence = self._step_fn(
                    jnp.asarray(search_crop),
                    self._template_features,
                    jnp.asarray(self.prev_size, jnp.float32),
                )
        pred = rescale_crop_bbox(np.asarray(crop_bbox), window, self.config.instance_size)
        pred = clamp_bbox(pred, image.shape)
        self.bbox = pred
        self.paths.append(pred)
        self.last_confidence = float(confidence)
        self._frame_count += 1
        if (
            self.dynamic_template
            and not self.native_preprocess
            and float(confidence) > self.update_threshold
            and self._frame_count % self.update_interval == 0
        ):
            cand_crop, _, _ = get_extended_crop(
                image=image,
                bbox=pred,
                offset=self.config.template_bbox_offset,
                crop_size=self.config.template_size,
            )
            cand = self._features_fn(jnp.asarray(cand_crop))
            self._dyn_features = (
                (1.0 - self.update_rate) * self._dyn_features + self.update_rate * cand
            )
        return {"bbox": pred, "confidence": float(confidence)}
