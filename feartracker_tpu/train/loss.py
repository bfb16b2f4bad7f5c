"""FEAR training loss: balanced BCE classification + (1 − IoU) regression.

Functional JAX port of the reference loss (ref: model_training/train/loss.py).
The reference gathers positive cells with ``torch.nonzero`` (dynamic shapes);
here the same means are computed with static-shape masks — identical values,
XLA-friendly.

Maps are channel-last: pred/target regression (B, H, W, 4) LTRB,
classification (B, H, W, 1), regression weights (B, H, W).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from feartracker_tpu.utils.constants import (
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
    TARGET_REGRESSION_WEIGHT_KEY,
)


def calc_iou(target: jnp.ndarray, pred: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """IoU between LTRB offset fields (ref: loss.py:13-22)."""
    target_area = (target[..., 0] + target[..., 2]) * (target[..., 1] + target[..., 3])
    pred_area = (pred[..., 0] + pred[..., 2]) * (pred[..., 1] + pred[..., 3])
    w_i = jnp.minimum(pred[..., 0], target[..., 0]) + jnp.minimum(pred[..., 2], target[..., 2])
    h_i = jnp.minimum(pred[..., 3], target[..., 3]) + jnp.minimum(pred[..., 1], target[..., 1])
    inter = w_i * h_i
    union = target_area + pred_area - inter
    return (inter + smooth) / (union + smooth)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(x * mask) / jnp.maximum(denom, 1.0), 0.0)


def regression_loss(pred: jnp.ndarray, target: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """mean(1 − IoU) over cells with positive regression weight
    (ref: loss.py:25-42,52-65)."""
    losses = 1.0 - calc_iou(target, pred)
    return _masked_mean(losses, (weight > 0).astype(losses.dtype))


def _bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCEWithLogits."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """0.5·mean(BCE | pos) + 0.5·mean(BCE | neg) (ref: loss.py:67-82)."""
    bce = _bce_with_logits(logits, labels)
    pos = (labels == 1).astype(bce.dtype)
    neg = (labels == 0).astype(bce.dtype)
    return 0.5 * _masked_mean(bce, pos) + 0.5 * _masked_mean(bce, neg)


def fear_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    coeffs: Dict[str, float] = None,
) -> Dict[str, jnp.ndarray]:
    """(ref: loss.py:84-96; coeffs from config/loss/fear_loss.yaml)."""
    if coeffs is None:
        coeffs = {TARGET_CLASSIFICATION_KEY: 1.0, TARGET_REGRESSION_LABEL_KEY: 1.0}
    reg = regression_loss(
        outputs[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
        targets[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
        targets[TARGET_REGRESSION_WEIGHT_KEY].astype(jnp.float32),
    )
    cls = classification_loss(
        outputs[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
        targets[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
    )
    return {
        TARGET_CLASSIFICATION_KEY: cls * coeffs[TARGET_CLASSIFICATION_KEY],
        TARGET_REGRESSION_LABEL_KEY: reg * coeffs[TARGET_REGRESSION_LABEL_KEY],
    }
