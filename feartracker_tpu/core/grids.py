"""Score-map coordinate grids.

Functional equivalent of ``make_grid`` (ref: model_training/utils/utils.py:183-199):
each score-map cell maps to the pixel position, inside the search crop, that it
is responsible for:  ``grid = (idx - floor(score_size // 2)) * stride + instance_size // 2``.

With the released config (score_size=16, stride=16, instance_size=256) this is
``(idx - 8) * 16 + 128``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def make_grid_np(score_size: int, total_stride: int, instance_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(grid_x, grid_y), each (score_size, score_size) float32, host numpy."""
    idx = np.arange(score_size, dtype=np.float32) - np.floor(float(score_size // 2))
    x, y = np.meshgrid(idx, idx)
    grid_x = x * total_stride + instance_size // 2
    grid_y = y * total_stride + instance_size // 2
    return grid_x.astype(np.float32), grid_y.astype(np.float32)


def make_grid(score_size: int, total_stride: int, instance_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(grid_x, grid_y) as device arrays. Safe to call inside jit: the values
    are compile-time constants folded into the graph."""
    gx, gy = make_grid_np(score_size, total_stride, instance_size)
    return jnp.asarray(gx), jnp.asarray(gy)
