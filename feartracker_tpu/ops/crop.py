"""Device-side crop engine: fused crop + pad + resize + normalize, jittable.

The reference crops on the host with cv2 every frame and uploads the result
(ref: fear_tracker.py:53-59 → utils/utils.py:215-253), crossing the
host↔device boundary twice per frame. Here the full frame lives in HBM and a
fixed-size crop is produced on device by bilinear gather — the key departure
that lets the whole tracking step run inside one jitted ``lax.scan``
(SURVEY.md §7 step 2).

Semantics match the host path: the source window is the integer context
window from ``extend_bbox``; samples outside the frame read the per-stream
pad color (the reference pads first, then cv2-resizes — sampling the virtual
padded frame is equivalent); the resize uses cv2's INTER_LINEAR sample grid
``src = (dst + 0.5)·scale − 0.5``.

Output shapes are static (128²/256²) — only the *source* window varies — so
the op is scan- and vmap-friendly (SURVEY.md §7 "dynamic shapes").
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from feartracker_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


def crop_resize(
    frame: jnp.ndarray,
    window: jnp.ndarray,
    out_size: int,
    pad_value: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear-sample an ``out_size``² crop of ``window`` from ``frame``.

    Args:
      frame: (H, W, C) float32 full frame.
      window: (4,) float32 [x, y, w, h] integer-valued source window (may
        extend past the frame).
      out_size: static output side.
      pad_value: (C,) fill color for out-of-frame samples.
    Returns:
      (out_size, out_size, C) float32 crop.
    """
    H, W = frame.shape[0], frame.shape[1]
    wx, wy, ww, wh = window[0], window[1], window[2], window[3]

    # cv2 INTER_LINEAR grid: src = (dst + 0.5) * (src_size / dst_size) - 0.5,
    # clamped into the window — cv2 resizes the (padded) crop image and
    # border-replicates at its edges, so samples never read past the window
    d = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    src_x = jnp.clip(wx + d * ww - 0.5, wx, wx + ww - 1.0)
    src_y = jnp.clip(wy + d * wh - 0.5, wy, wy + wh - 1.0)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[None, :, None]  # (1, out, 1)
    fy = (src_y - y0)[:, None, None]  # (out, 1, 1)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def sample(yi, xi):
        """frame[yi, xi] with out-of-bounds → pad_value; yi (out,), xi (out,)."""
        inside_y = (yi >= 0) & (yi < H)
        inside_x = (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = frame[yc][:, xc]  # (out, out, C)
        inside = inside_y[:, None, None] & inside_x[None, :, None]
        return jnp.where(inside, vals, pad_value)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _interp_matrix(
    origin: jnp.ndarray, size: jnp.ndarray, src_len: int, out_size: int, dtype,
    grid: str = "resize",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rows of the 1-D bilinear interpolation operator for one axis.

    Returns (R (out_size, src_len), wsum (out_size,)) where R@src performs the
    axis resize with out-of-range samples dropped (weight 0) and ``wsum`` is
    the retained weight per output element (1 inside, <1 at the pad border,
    0 fully outside) — used to mix in the pad color separably.

    ``grid``: "resize" = cv2.resize INTER_LINEAR sampling
    (src = origin + (dst+0.5)·size/out − 0.5, clamped into the window —
    border-replicate like resizing a pre-cropped image); "affine" =
    cv2.warpAffine with scale (out−1)/size (src = origin + dst·size/(out−1),
    unclamped — constant border), the grid BBoxCropWithOffsets uses
    (ref: aug.py:130-142).
    """
    if grid == "affine":
        d_idx = jnp.arange(out_size, dtype=jnp.float32)
        src = origin + d_idx * size / (out_size - 1)
    else:
        d = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
        src = jnp.clip(origin + d * size - 0.5, origin, origin + size - 1.0)
    s0 = jnp.floor(src)
    f = src - s0
    s0 = s0.astype(jnp.int32)
    idx = jnp.arange(src_len, dtype=jnp.int32)
    w0 = jnp.where((s0 >= 0) & (s0 < src_len), 1.0 - f, 0.0)
    w1 = jnp.where((s0 + 1 >= 0) & (s0 + 1 < src_len), f, 0.0)
    R = w0[:, None] * (s0[:, None] == idx[None, :]) + w1[:, None] * (s0[:, None] + 1 == idx[None, :])
    return R.astype(dtype), (w0 + w1).astype(jnp.float32)


def crop_resize_mm(
    frame: jnp.ndarray,
    window: jnp.ndarray,
    out_size: int,
    pad_value: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
    grid: str = "resize",
) -> jnp.ndarray:
    """Matmul formulation of :func:`crop_resize` — the TPU-fast path.

    Bilinear resampling is separable, so the crop is two dense contractions
    ``R_y @ frame @ R_xᵀ`` that run on the MXU instead of the gather chains
    XLA emits for index-based sampling (measured ~10× faster per step on
    v5e for the tracking workload). Out-of-frame samples carry zero weight in
    the operators; the pad color is mixed back in with the separable retained
    -weight outer product — numerically identical to :func:`crop_resize`.
    """
    H, W = frame.shape[0], frame.shape[1]
    Ry, wy = _interp_matrix(window[1], window[3], H, out_size, compute_dtype, grid)
    Rx, wx = _interp_matrix(window[0], window[2], W, out_size, compute_dtype, grid)
    f = frame.astype(compute_dtype)
    tmp = jnp.einsum("oh,hwc->owc", Ry, f, preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", Rx, tmp.astype(compute_dtype), preferred_element_type=jnp.float32)
    wmap = (wy[:, None] * wx[None, :])[..., None]
    return out + (1.0 - wmap) * pad_value


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """[0,255] float pixels → ImageNet-normalized (ref: base_tracker.py:69-81)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (x - mean) / std


def extended_crop_window(bbox: jnp.ndarray, offset: float) -> jnp.ndarray:
    """Device twin of ``extend_bbox`` (ref: utils/utils.py:29-57): grow by
    ``offset`` per side, truncate to integers."""
    x, y, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    out = jnp.stack([x - w * offset, y - h * offset, w * (1.0 + 2 * offset), h * (1.0 + 2 * offset)])
    return jnp.trunc(out)


def crop_bbox_in_window(bbox: jnp.ndarray, window: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Where ``bbox`` lands inside the resized crop (float, crop pixels) —
    mirrors the padded_bbox → resize transform of the host path."""
    scale_x = out_size / window[2]
    scale_y = out_size / window[3]
    x = (bbox[0] - window[0]) * scale_x
    y = (bbox[1] - window[1]) * scale_y
    return jnp.stack([x, y, bbox[2] * scale_x, bbox[3] * scale_y])
