"""Pallas TPU kernel: fused penalty-window decode.

One VMEM-resident kernel per stream fuses the whole postprocess chain —
sigmoid → scale/ratio penalty → cosine-window mix → argmax → box select →
size smoothing (ref: base_tracker.py:149-205 + box_coder.py:75-107, which the
reference ran as separate torch ops with a ``.cpu()`` sync). Replaces the
~10 tiny XLA kernels of :func:`feartracker_tpu.core.postprocess.postprocess`
with a single fused launch inside the tracking scan.

Grid: one program per stream; all (16·16) maps live in VMEM registers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feartracker_tpu.core.grids import make_grid_np
from feartracker_tpu.core.postprocess import PostprocessConfig, PostprocessResult, _window_np


def _decode_kernel(
    cls_ref,  # (1, H, W)
    reg_ref,  # (1, H, W, 4)
    prev_ref,  # (S, 2) full array; row s = this program's stream
    win_ref,  # (H, W)
    gx_ref,  # (H, W)
    gy_ref,  # (H, W)
    bbox_ref,  # (S, 4) full array (each program writes its row)
    conf_ref,  # (S, 2) full array: (confidence, flat argmax index)
    *,
    cfg: PostprocessConfig,
):
    H, W = win_ref.shape
    s = pl.program_id(0)
    cls_score = jax.nn.sigmoid(cls_ref[0].astype(jnp.float32))
    reg = reg_ref[0].astype(jnp.float32)
    gx = gx_ref[:]
    gy = gy_ref[:]
    x1 = gx - reg[..., 0]
    y1 = gy - reg[..., 1]
    x2 = gx + reg[..., 2]
    y2 = gy + reg[..., 3]

    if cfg.smooth:
        pw = x2 - x1
        ph = y2 - y1
        prev_w = prev_ref[s, 0]
        prev_h = prev_ref[s, 1]

        def ssz(w, h):
            pad = (w + h) * 0.5
            return jnp.sqrt((w + pad) * (h + pad))

        def lim(r):
            return jnp.maximum(r, 1.0 / r)

        s_c = lim(ssz(pw, ph) / ssz(prev_w, prev_h))
        r_c = lim((prev_w / prev_h) / (pw / ph))
        penalty = jnp.exp(-(r_c * s_c - 1.0) * cfg.penalty_k)
        pscore = penalty * cls_score
        pscore = pscore * (1.0 - cfg.window_influence) + win_ref[:] * cfg.window_influence
    else:
        penalty = jnp.ones_like(cls_score)
        pscore = cls_score

    # argmax with row-major first-match tie-break (== torch flat argmax),
    # without a (H,W)→(1,H·W) reshape, which Mosaic cannot lay out
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rowmajor = row_ids * W + col_ids
    peak = jnp.max(pscore)
    idx = jnp.min(jnp.where(pscore == peak, rowmajor, H * W))

    onehot = (rowmajor == idx).astype(jnp.float32)

    def pick(m):
        return jnp.sum(m * onehot)

    bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
    bw = bx2 - bx1
    bh = by2 - by1
    conf = pick(cls_score)

    if cfg.smooth:
        lr = pick(penalty) * conf * cfg.lr
        sw = bw * lr
        sh = bh * lr
        kw = prev_w * (1.0 - lr)
        kh = prev_h * (1.0 - lr)
        bw = kw + lr * (sw + kw)
        bh = kh + lr * (sh + kh)

    # vector stores (scalar stores to VMEM are not supported)
    bbox_ref[pl.ds(s, 1), :] = jnp.stack([bx1, by1, bw, bh]).reshape(1, 4)
    conf_ref[pl.ds(s, 1), :] = jnp.stack([conf, jnp.asarray(idx, jnp.float32)]).reshape(1, 2)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def postprocess_pallas(
    cls_logits: jnp.ndarray,
    regression_map: jnp.ndarray,
    cfg: PostprocessConfig,
    prev_size: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> PostprocessResult:
    """Drop-in fused replacement for ``core.postprocess.postprocess``.

    Args match the reference semantics: ``cls_logits`` (S, H, W[, 1]),
    ``regression_map`` (S, H, W, 4), ``prev_size`` (S, 2) when smoothing.
    """
    if cls_logits.ndim == 4:
        cls_logits = cls_logits[..., 0]
    S, H, W = cls_logits.shape
    if prev_size is None:
        prev_size = jnp.ones((S, 2), jnp.float32)

    gx, gy = make_grid_np(cfg.score_size, cfg.total_stride, cfg.instance_size)
    win = _window_np(cfg.windowing, cfg.score_size)

    bbox, conf_idx = pl.pallas_call(
        functools.partial(_decode_kernel, cfg=cfg),
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, 4), lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 4), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 4), jnp.float32),
            jax.ShapeDtypeStruct((S, 2), jnp.float32),
        ],
        interpret=interpret,
    )(
        cls_logits.astype(jnp.float32),
        regression_map.astype(jnp.float32),
        prev_size.astype(jnp.float32),
        jnp.asarray(win),
        jnp.asarray(gx),
        jnp.asarray(gy),
    )
    idx = conf_idx[:, 1].astype(jnp.int32)
    coords = jnp.stack([idx // W, idx % W], axis=-1).astype(jnp.int32)
    return PostprocessResult(bbox=bbox, confidence=conf_idx[:, 0], pred_coords=coords)
