"""Feature-conditioned dual-template update gate ("gate v2").

The scalar ``template_gate`` (models/fear_net.py forward_dual) trained to
sigmoid=0.866 and then measured ≡ the untrained 0.5 blend and ≡ plain EMA —
and all four measured scalar *signal* gates (confidence threshold sweep,
APCE, candidate similarity, bbox stability; BENCHMARKS.md "not a lever"
sections) failed individually: each signal is ambiguous on its own (e.g. a
high-contrast occluder yields a *sharper* peak, so APCE alone mis-fires).

This module is the multi-feature hypothesis those negatives motivate: a tiny
MLP over the per-frame observables the scan runtime already computes decides
the per-stream EMA rate each frame,

    rate = sigmoid(MLP(obs)) * update_rate_max,

trained with BCE against an analytic "safe to update" oracle on synthetic
mixed-scenario rollouts (the generator knows the per-frame visible fraction;
tools/train_feature_gate.py). There is no hard confidence threshold in this
mode — the gate subsumes it.

Observable vector (order is the on-disk contract, see OBS_FEATURES):
  0 confidence       — decoded peak score (0..1)
  1 apce             — log1p(APCE)/4 (peak sharpness, normalized)
  2 sim_static       — cosine(candidate feats, static template feats)
  3 sim_dyn          — cosine(candidate feats, current dynamic template)
  4 log_size_ratio   — 0.5·log(area_t/area_{t-1}), clipped to ±1
  5 center_shift     — |center_t − center_{t-1}| / sqrt(area_{t-1}), clip 2

Ref hook: the reference exposes the dual-template ``update`` input on its
BoxTower (model_training/model/blocks.py:174-181) but never released the
update policy (README.md:96) — this is the policy, learned.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

OBS_FEATURES = (
    "confidence",
    "apce",
    "sim_static",
    "sim_dyn",
    "log_size_ratio",
    "center_shift",
)
N_OBS = len(OBS_FEATURES)
DEFAULT_HIDDEN = 8


def init_gate_params(rng: np.random.RandomState, hidden: int = DEFAULT_HIDDEN) -> Dict[str, np.ndarray]:
    """Small-init MLP params (numpy, host-side — the gate trains on host)."""
    return {
        "w1": (rng.randn(N_OBS, hidden) * 0.3).astype(np.float32),
        "b1": np.zeros((hidden,), np.float32),
        "w2": (rng.randn(hidden, 1) * 0.3).astype(np.float32),
        "b2": np.zeros((1,), np.float32),
    }


def gate_logit(params, obs: jnp.ndarray) -> jnp.ndarray:
    """(S, N_OBS) observables → (S,) pre-sigmoid update logit."""
    h = jnp.tanh(obs @ params["w1"] + params["b1"])
    return (h @ params["w2"] + params["b2"])[..., 0]


def gate_rate(params, obs: jnp.ndarray) -> jnp.ndarray:
    """(S, N_OBS) → (S,) update probability in [0, 1] (the caller scales by
    its max EMA rate)."""
    return jax.nn.sigmoid(gate_logit(params, obs))


def _cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise cosine similarity of flattened feature maps: (S, ...) → (S,)."""
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    num = jnp.sum(af * bf, -1)
    den = jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1) + 1e-8
    return num / den


def gate_observables(
    confidence: jnp.ndarray,
    apce: jnp.ndarray,
    cand_feats: jnp.ndarray,
    template_feats: jnp.ndarray,
    dyn_feats: jnp.ndarray,
    bbox: jnp.ndarray,
    prev_bbox: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble the (S, N_OBS) observable matrix (see module docstring for
    the feature contract). All inputs are per-stream device arrays; cheap
    (O(S·8·8·C)) next to the model forward."""
    area = jnp.maximum(bbox[:, 2] * bbox[:, 3], 1.0)
    prev_area = jnp.maximum(prev_bbox[:, 2] * prev_bbox[:, 3], 1.0)
    log_ratio = jnp.clip(0.5 * jnp.log(area / prev_area), -1.0, 1.0)
    center = bbox[:, :2] + bbox[:, 2:] * 0.5
    prev_center = prev_bbox[:, :2] + prev_bbox[:, 2:] * 0.5
    shift = jnp.clip(
        jnp.linalg.norm(center - prev_center, axis=-1) / jnp.sqrt(prev_area), 0.0, 2.0
    )
    return jnp.stack(
        [
            confidence.astype(jnp.float32),
            jnp.log1p(apce.astype(jnp.float32)) / 4.0,
            _cosine(cand_feats, template_feats),
            _cosine(cand_feats, dyn_feats),
            log_ratio.astype(jnp.float32),
            shift.astype(jnp.float32),
        ],
        axis=-1,
    )


def save_gate(params, path: str) -> None:
    np.savez(path, **{k: np.asarray(v, np.float32) for k, v in params.items()})


def load_gate(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        params = {k: z[k] for k in ("w1", "b1", "w2", "b2")}
    if params["w1"].shape[0] != N_OBS:
        raise ValueError(
            f"gate file {path} expects {params['w1'].shape[0]} observables, "
            f"runtime provides {N_OBS}"
        )
    return params
