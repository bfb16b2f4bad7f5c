"""The jitted training step: loss, grads, sync-BN, data-parallel update.

Replaces the reference's Lightning ``training_step`` + DDP machinery
(ref: fear_lightning_model.py:56-91, trainer.py:47-70): one pure function,
wrapped in ``shard_map`` over the ``data`` mesh axis so that
  * the batch is sharded over ICI,
  * gradients are ``pmean``-ed (≙ NCCL all-reduce),
  * BatchNorm reduces its statistics over the axis (≙ ``sync_batchnorm``,
    config/backend/2gpu.yaml:5) via the model's ``bn_axis_name``.

Per-step metrics (decoded-box IoU against the batch GT, failure rate,
per-dataset IoU sums — ref: fear_lightning_model.py:66-91) are computed
inside the same graph, on device.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from feartracker_tpu.core import box_coder as bc
from feartracker_tpu.core.geometry_jax import box_iou_xywh
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.parallel.mesh import DATA_AXIS
from feartracker_tpu.train.loss import fear_loss
from feartracker_tpu.utils.constants import (
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
    TARGET_VISIBILITY_KEY,
    TRACKER_TARGET_AUX_IMAGE_KEY,
    TRACKER_TARGET_BBOX_KEY,
    TRACKER_TARGET_SEARCH_IMAGE_KEY,
    TRACKER_TARGET_TEMPLATE_IMAGE_KEY,
)

DATASET_ID_KEY = "DATASET_ID_KEY"  # int32 per-sample dataset index


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: FEARNet, tx: optax.GradientTransformation, rng, template_shape, search_shape) -> TrainState:
    variables = model.init(rng, (jnp.zeros(template_shape), jnp.zeros(search_shape)), train=False)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _step_metrics(outputs, batch, spec: bc.BoxCoderSpec) -> Dict[str, jnp.ndarray]:
    """Decoded-box IoU metrics masked by visibility
    (ref: fear_lightning_model.py:66-91)."""
    dec = bc.decode(
        outputs[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
        outputs[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
        spec,
        use_sigmoid=True,
    )
    gt = batch[TRACKER_TARGET_BBOX_KEY].astype(jnp.float32)
    vis = batch[TARGET_VISIBILITY_KEY].reshape(-1).astype(jnp.float32)
    ious = box_iou_xywh(dec.bbox, gt)
    denom = jnp.maximum(vis.sum(), 1.0)
    box_iou = jnp.sum(ious * vis) / denom
    fail = jnp.sum((ious == 0).astype(jnp.float32) * vis) / denom
    return {"box_iou": box_iou, "failure_rate": fail, "ious": ious, "visibility": vis}


def make_train_step(
    model: FEARNet,
    tx: optax.GradientTransformation,
    coeffs: Optional[Dict[str, float]] = None,
    spec: bc.BoxCoderSpec = bc.BoxCoderSpec(),
    mesh: Optional[Mesh] = None,
    dual_template: bool = False,
    device_augs: Optional[Any] = None,
    aug_seed: int = 0,
    guard_non_finite: bool = False,
):
    """Build the jitted train step. With ``mesh`` the step is shard_map-ed
    over the ``data`` axis (model must be built with
    ``bn_axis_name=DATA_AXIS``); without, it is plain single-device jit.
    ``dual_template`` trains through ``forward_dual`` (the learned dynamic-
    template interpolation) — the batch must carry the AUX image key.
    ``device_augs`` (a data.device_augs.DeviceAugConfig) expects a STAGED
    uint8 batch and runs random crop + augmentations + normalization + label
    encoding on device inside this step (PRNG = fold(aug_seed, step[, shard]))."""

    def loss_fn(params, batch_stats, batch):
        if dual_template:
            inputs = (
                batch[TRACKER_TARGET_TEMPLATE_IMAGE_KEY],
                batch[TRACKER_TARGET_SEARCH_IMAGE_KEY],
                batch[TRACKER_TARGET_AUX_IMAGE_KEY],
            )
            method = model.forward_dual
        else:
            inputs = (
                batch[TRACKER_TARGET_TEMPLATE_IMAGE_KEY],
                batch[TRACKER_TARGET_SEARCH_IMAGE_KEY],
            )
            method = None
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs,
            train=True,
            mutable=["batch_stats"],
            method=method,
        )
        losses = fear_loss(out, batch, coeffs)
        total = losses[TARGET_CLASSIFICATION_KEY] + losses[TARGET_REGRESSION_LABEL_KEY]
        return total, (losses, out, mutated["batch_stats"])

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if device_augs is not None:
            from feartracker_tpu.data.device_augs import augment_batch

            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), state.step)
            if mesh is not None:
                # decorrelate augmentation draws across shards
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            batch = augment_batch(batch, key, device_augs)
        (total, (losses, out, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        metrics = _step_metrics(out, batch, spec)
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            total = jax.lax.pmean(total, DATA_AXIS)
            losses = jax.lax.pmean(losses, DATA_AXIS)
            metrics = {
                k: (jax.lax.pmean(v, DATA_AXIS) if v.ndim == 0 else v)
                for k, v in metrics.items()
            }
            # BN stats were already cross-replica-averaged inside the model
            # via bn_axis_name, but per-shard rounding can drift: pin exact
            # replication with one more pmean (cheap; stats are tiny).
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        if guard_non_finite:
            # the optimizer side is covered by optax.apply_if_finite; BN
            # running stats mutate in the forward pass and need the same
            # protection — a NaN batch must not poison them either
            stats_ok = jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree_util.tree_leaves(new_stats)]
                )
            ) & jnp.isfinite(total)
            new_stats = jax.tree.map(
                lambda new, old: jnp.where(stats_ok, new, old), new_stats, state.batch_stats
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        scalars = {
            "loss": total,
            "cls_loss": losses[TARGET_CLASSIFICATION_KEY],
            "reg_loss": losses[TARGET_REGRESSION_LABEL_KEY],
            "box_iou": metrics["box_iou"],
            "failure_rate": metrics["failure_rate"],
        }
        return new_state, {
            **scalars,
            "ious": metrics["ious"],
            "visibility": metrics["visibility"],
            # raw maps for the best/worst-batch mosaics (tiny: B·16·16·5)
            "cls_map": out[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
            "reg_map": out[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
        }

    if mesh is None:
        return jax.jit(step_fn)

    out_metric_spec = {
        "loss": P(),
        "cls_loss": P(),
        "reg_loss": P(),
        "box_iou": P(),
        "failure_rate": P(),
        "ious": P(DATA_AXIS),
        "visibility": P(DATA_AXIS),
        "cls_map": P(DATA_AXIS),
        "reg_map": P(DATA_AXIS),
    }
    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),  # state replicated, every batch leaf sharded
        out_specs=(P(), out_metric_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_train_multistep(step, k: int):
    """Fuse ``k`` optimizer steps into ONE dispatch: ``lax.scan`` over batches
    stacked on a leading (k, ...) axis.

    Why: on remote-attached accelerators each dispatch costs host RPC time
    that the state-chained train loop cannot hide (measured: 16 ms device
    busy inside a 39 ms wall step through this environment's tunnel —
    BENCHMARKS.md); k steps per dispatch amortize it k-fold. This is the
    training twin of the tracking runtime's frame scan.

    Args:
      step: a train step from :func:`make_train_step` (plain or shard_map'd —
        it inlines under the outer jit either way).
      k: steps per dispatch (static).
    Returns:
      ``multi(state, batches) -> (state, metrics)`` where every ``batches``
      leaf carries a leading (k, ...) axis and every metric leaf returns
      stacked over it.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def multi(state: TrainState, batches):
        return jax.lax.scan(step, state, batches, length=k)

    return jax.jit(multi)


def stack_batches(batches):
    """Host helper: list of k batch dicts → one dict with leading (k, ...)
    arrays (device keys only — callers filter non-array keys first)."""
    import numpy as np

    return {key: np.stack([b[key] for b in batches]) for key in batches[0]}
