"""MACs / params counting via XLA cost analysis.

Replaces the reference's thop profile of ``model.track`` with search
(1,3,256,256) + template feats (1,256,8,8) (ref: evaluate/macs_params.py:20-31,
README.md:55-58) — here the numbers come from the compiled HLO itself.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def track_cost(model, variables, search_size: int = 256, feat_size: int = 8, channels: int = 256) -> Dict[str, float]:
    """FLOPs + bytes of one jitted track() call (the deployed graph)."""

    def fn(variables, search, feats):
        out = model.apply(variables, search, feats, method=model.track)
        return out["TARGET_REGRESSION_LABEL_KEY"], out["TARGET_CLASSIFICATION_KEY"]

    search = jnp.zeros((1, search_size, search_size, 3), jnp.float32)
    feats = jnp.zeros((1, feat_size, feat_size, channels), jnp.float32)
    lowered = jax.jit(fn).lower(variables, search, feats)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return {
        "flops": flops,
        "macs": flops / 2.0,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "params": float(count_params(variables["params"])),
    }
