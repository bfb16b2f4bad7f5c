"""Score-map postprocessing: scale/ratio penalty, cosine-window mixing and
SiamFC-style size smoothing.

Pure-JAX, batched re-implementation of the reference's host/GPU postprocess
(ref: model_training/tracker/base_tracker.py:126-205 and
fear_tracker.py:74-86). In the reference this path crosses the device boundary
every frame (``.cpu()`` in decode); here it is a closed-form function fused
into the jitted tracker step.

Note: the released config (config/tracker/siam_tracker.yaml) carries no
``smooth`` key, so the reference demo runs with the penalty/window/smoothing
branch disabled (base_tracker.py:153-154,176-177). Both modes are supported
via the static ``smooth`` flag.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.core import box_coder as bc


class PostprocessConfig(NamedTuple):
    """Decode constants (ref: config/tracker/siam_tracker.yaml:2-7)."""

    penalty_k: float = 0.062
    window_influence: float = 0.38
    lr: float = 0.765
    windowing: str = "cosine"
    score_size: int = 16
    total_stride: int = 16
    instance_size: int = 256
    smooth: bool = False

    @property
    def box_spec(self) -> bc.BoxCoderSpec:
        return bc.BoxCoderSpec(self.score_size, self.total_stride, self.instance_size)


@lru_cache(maxsize=4)
def _window_np(windowing: str, score_size: int) -> np.ndarray:
    """Hanning outer-product window (ref: base_tracker.py:57-67)."""
    if windowing == "cosine":
        return np.outer(np.hanning(score_size), np.hanning(score_size)).astype(np.float32)
    return np.ones((score_size, score_size), np.float32)


def tracking_window(cfg: PostprocessConfig) -> jnp.ndarray:
    return jnp.asarray(_window_np(cfg.windowing, cfg.score_size))


def _limit(r: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(r, 1.0 / r)


def _squared_size(w: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    pad = (w + h) * 0.5
    return jnp.sqrt((w + pad) * (h + pad))


def penalty_scores(
    cls_score: jnp.ndarray,
    regression_map: jnp.ndarray,
    prev_size: jnp.ndarray,
    cfg: PostprocessConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale/ratio-penalized, window-mixed score map
    (ref: base_tracker.py:166-205).

    Args:
      cls_score: (B, H, W) sigmoid classification scores.
      regression_map: (B, H, W, 4) LTRB offsets.
      prev_size: (B, 2) previous (w, h) in search-crop pixels.
    Returns:
      (pscore (B, H, W), penalty (B, H, W)).
    """
    loc = bc.pred_locations(regression_map, cfg.box_spec)  # (B,H,W,4) xyxy
    pw = loc[..., 2] - loc[..., 0]
    ph = loc[..., 3] - loc[..., 1]
    prev_w = prev_size[:, 0, None, None]
    prev_h = prev_size[:, 1, None, None]

    s_c = _limit(_squared_size(pw, ph) / _squared_size(prev_w, prev_h))
    r_c = _limit((prev_w / prev_h) / (pw / ph))
    penalty = jnp.exp(-(r_c * s_c - 1.0) * cfg.penalty_k)
    pscore = penalty * cls_score
    window = tracking_window(cfg)
    pscore = pscore * (1.0 - cfg.window_influence) + window * cfg.window_influence
    return pscore, penalty


def smooth_size(
    pred_size: jnp.ndarray, prev_size: jnp.ndarray, lr: jnp.ndarray
) -> jnp.ndarray:
    """SiamFC-style exponential size smoothing, replicated verbatim
    (ref: base_tracker.py:126-139 ``_smooth_size``).

    Args:
      pred_size: (..., 2) predicted (w, h).
      prev_size: (..., 2) previous (w, h).
      lr: (...,) per-sample learning rate.
    """
    lr = lr[..., None]
    scaled = pred_size * lr
    kept = prev_size * (1.0 - lr)
    return kept + lr * (scaled + kept)


def apce(score: jnp.ndarray) -> jnp.ndarray:
    """Average peak-to-correlation energy (LMCF, CVPR'17) of a score map:
    ``(max−min)² / mean((v−min)²)`` — whole-map peak sharpness, high for a
    single sharp mode, low for flat/multimodal responses.

    Emitted per frame by the scan runtime as a DIAGNOSTIC observable.
    Measured on the structural synthetic suite
    (tools/occlusion_signal_probe.py, BENCHMARKS.md): NOT a usable
    dual-template update gate — occluder absorptions show *higher* APCE than
    good updates (a high-contrast occluder yields a sharper peak).

    Args:
      score: (B, H, W) score map (e.g. sigmoid classification scores).
    Returns:
      (B,) float32.
    """
    smin = jnp.min(score, axis=(1, 2))
    smax = jnp.max(score, axis=(1, 2))
    energy = jnp.mean((score - smin[:, None, None]) ** 2, axis=(1, 2))
    return (smax - smin) ** 2 / (energy + 1e-12)


class PostprocessResult(NamedTuple):
    bbox: jnp.ndarray  # (B, 4) xywh in search-crop pixels
    confidence: jnp.ndarray  # (B,) raw sigmoid cls score at the chosen cell
    pred_coords: jnp.ndarray  # (B, 2) int32 (row, col)


def postprocess(
    cls_logits: jnp.ndarray,
    regression_map: jnp.ndarray,
    cfg: PostprocessConfig,
    prev_size: Optional[jnp.ndarray] = None,
) -> PostprocessResult:
    """Full decode: sigmoid → (optional) penalty/window → argmax box →
    (optional) size smoothing (ref: fear_tracker.py:74-86 ``_postprocess``).

    ``smooth`` is a trace-time constant (cfg.smooth), so the jitted graph
    contains only the branch in use.
    """
    if cls_logits.ndim == 4:
        cls_logits = cls_logits[..., 0]
    cls_score = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    regression_map = regression_map.astype(jnp.float32)

    if cfg.smooth:
        assert prev_size is not None, "smooth postprocess needs prev_size"
        pscore, penalty = penalty_scores(cls_score, regression_map, prev_size, cfg)
    else:
        pscore, penalty = cls_score, jnp.ones_like(cls_score)

    dec = bc.decode(regression_map, pscore, cfg.box_spec, use_sigmoid=False)
    B = cls_score.shape[0]
    batch_idx = jnp.arange(B)
    r, c = dec.pred_coords[:, 0], dec.pred_coords[:, 1]
    confidence = cls_score[batch_idx, r, c]

    bbox = dec.bbox
    if cfg.smooth:
        lr = penalty[batch_idx, r, c] * confidence * cfg.lr
        wh = smooth_size(bbox[:, 2:], prev_size, lr)
        bbox = jnp.concatenate([bbox[:, :2], wh], axis=-1)

    return PostprocessResult(bbox=bbox, confidence=confidence, pred_coords=dec.pred_coords)
