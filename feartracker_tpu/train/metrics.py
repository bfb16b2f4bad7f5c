"""Training/validation metrics as pure functions + a dense dataset-aware
accumulator.

Replaces the reference's torchmetrics stack (ref: model_training/metrics/):
``BoxIoUMetric`` and ``TrackingFailureRateMetric`` become stateless reductions
(their cross-rank ``dist_reduce_fx="sum"`` states are plain ``psum``-able
scalars here), and ``DatasetAwareMetric`` — which all-gathered Python dicts
across ranks (dataset_aware_metric.py:69-76) — becomes a dense (num_datasets,)
segment-sum that rides a single collective (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax.numpy as jnp

from feartracker_tpu.core.geometry_jax import box_iou_xywh


def box_iou_batch(pred_xywh: jnp.ndarray, gt_xywh: jnp.ndarray) -> jnp.ndarray:
    """Per-sample IoU (the diagonal the reference took of its NxM matrix,
    metrics/tracking.py:12-13)."""
    return box_iou_xywh(pred_xywh, gt_xywh)


def failure_rate(ious: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
    """Share of samples with IoU == 0 (ref: metrics/tracking.py:77-83)."""
    fail = (ious == 0).astype(jnp.float32)
    if mask is None:
        return jnp.mean(fail)
    m = mask.astype(jnp.float32)
    return jnp.sum(fail * m) / jnp.maximum(jnp.sum(m), 1.0)


class DatasetAwareSums(NamedTuple):
    """Dense per-dataset accumulator: reduce with a single psum/sum."""

    value_sum: jnp.ndarray  # (num_datasets,)
    count: jnp.ndarray  # (num_datasets,)

    @classmethod
    def zeros(cls, num_datasets: int) -> "DatasetAwareSums":
        return cls(jnp.zeros(num_datasets), jnp.zeros(num_datasets))

    def update(self, dataset_ids: jnp.ndarray, values: jnp.ndarray, mask: jnp.ndarray = None) -> "DatasetAwareSums":
        """Accumulate ``values`` into their dataset buckets.

        Args:
          dataset_ids: (B,) int32 bucket per sample.
          values: (B,) metric values.
          mask: (B,) optional validity mask.
        """
        n = self.value_sum.shape[0]
        onehot = (dataset_ids[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
        if mask is not None:
            onehot = onehot * mask.astype(jnp.float32)[:, None]
        return DatasetAwareSums(
            value_sum=self.value_sum + onehot.T @ values.astype(jnp.float32),
            count=self.count + jnp.sum(onehot, axis=0),
        )

    def compute(self, names: Sequence[str], metric_name: str = "box_iou") -> Dict[str, float]:
        means = self.value_sum / jnp.maximum(self.count, 1.0)
        return {
            f"{name}_{metric_name}": float(means[i])
            for i, name in enumerate(names)
            if float(self.count[i]) > 0
        }
