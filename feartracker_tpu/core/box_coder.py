"""FEAR box coding: bbox ↔ (regression map, classification label) on the
stride-16 score grid.

Functional JAX re-implementation of ``FEARBoxCoder``
(ref: model_training/dataset/box_coder.py:53-107). Unlike the reference —
which decodes with a Python loop over the batch and a ``.cpu()`` sync — both
encode and decode here are pure, batched, jit- and vmap-able, and stay on
device. Maps are channel-last ``(..., H, W, C)`` to match the NHWC model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from feartracker_tpu.core.grids import make_grid


class EncodeResult(NamedTuple):
    regression_map: jnp.ndarray  # (B, H, W, 4) LTRB offsets
    classification_label: jnp.ndarray  # (B, H, W, 1) {0, 1}


class DecodeResult(NamedTuple):
    bbox: jnp.ndarray  # (B, 4) xywh in search-crop pixels
    pred_coords: jnp.ndarray  # (B, 2) int32 (row, col) of the argmax cell
    peak_score: jnp.ndarray  # (B,) classification score at the argmax cell


class BoxCoderSpec(NamedTuple):
    """Static grid geometry (ref: config/tracker/siam_tracker.yaml:6-7,14)."""

    score_size: int = 16
    total_stride: int = 16
    instance_size: int = 256


def encode(bboxes: jnp.ndarray, spec: BoxCoderSpec = BoxCoderSpec()) -> EncodeResult:
    """Encode xywh boxes ``(B, 4)`` into LTRB offset maps + inside-box labels
    (ref: box_coder.py:58-72: cls cell is positive iff min(LTRB) > 0)."""
    grid_x, grid_y = make_grid(spec.score_size, spec.total_stride, spec.instance_size)
    b = bboxes[:, :, None, None]  # (B, 4, 1, 1)
    left = grid_x - b[:, 0]
    top = grid_y - b[:, 1]
    right = b[:, 0] + b[:, 2] - grid_x
    bottom = b[:, 1] + b[:, 3] - grid_y
    reg = jnp.stack((left, top, right, bottom), axis=-1).astype(jnp.float32)  # (B,H,W,4)
    cls = (jnp.min(reg, axis=-1, keepdims=True) > 0).astype(jnp.float32)  # (B,H,W,1)
    return EncodeResult(regression_map=reg, classification_label=cls)


def get_box_coder(tracker_config: dict, tracker_name: str = "fear"):
    """API-parity registry (ref: box_coder.py:110-119 — the reference's
    default 'ocean' name returns None there too)."""
    if tracker_name == "fear":
        return BoxCoderSpec(
            score_size=int(tracker_config.get("score_size", 16)),
            total_stride=int(tracker_config.get("total_stride", 16)),
            instance_size=int(tracker_config.get("instance_size", 256)),
        )
    return None


def pred_locations(regression_map: jnp.ndarray, spec: BoxCoderSpec = BoxCoderSpec()) -> jnp.ndarray:
    """LTRB offset map (B,H,W,4) → xyxy corner map (B,H,W,4)
    (ref: box_coder.py:91-99)."""
    grid_x, grid_y = make_grid(spec.score_size, spec.total_stride, spec.instance_size)
    x1 = grid_x - regression_map[..., 0]
    y1 = grid_y - regression_map[..., 1]
    x2 = grid_x + regression_map[..., 2]
    y2 = grid_y + regression_map[..., 3]
    return jnp.stack((x1, y1, x2, y2), axis=-1)


def decode(
    regression_map: jnp.ndarray,
    classification_map: jnp.ndarray,
    spec: BoxCoderSpec = BoxCoderSpec(),
    use_sigmoid: bool = True,
) -> DecodeResult:
    """Pick the argmax score cell and read its box (ref: box_coder.py:75-107).

    The reference argmaxes the flattened map with C-order (row-major) ties →
    ``jnp.argmax`` over the flattened (H*W) axis reproduces the same winner.

    Args:
      regression_map: (B, H, W, 4) LTRB offsets.
      classification_map: (B, H, W) or (B, H, W, 1) scores (logits when
        ``use_sigmoid``; already-penalized probabilities otherwise).
    """
    if classification_map.ndim == 4:
        classification_map = classification_map[..., 0]
    if use_sigmoid:
        classification_map = jax.nn.sigmoid(classification_map.astype(jnp.float32))

    B, H, W = classification_map.shape
    flat = classification_map.reshape(B, H * W)
    idx = jnp.argmax(flat, axis=-1)  # (B,)
    r, c = idx // W, idx % W
    coords = jnp.stack([r, c], axis=-1).astype(jnp.int32)

    loc = pred_locations(regression_map, spec)  # (B, H, W, 4) xyxy
    sel = loc.reshape(B, H * W, 4)[jnp.arange(B), idx]  # (B, 4)
    bbox = jnp.stack(
        [sel[:, 0], sel[:, 1], sel[:, 2] - sel[:, 0], sel[:, 3] - sel[:, 1]], axis=-1
    )
    peak = flat[jnp.arange(B), idx]
    return DecodeResult(bbox=bbox, pred_coords=coords, peak_score=peak)
