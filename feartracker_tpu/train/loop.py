"""Config-driven training orchestration.

Replaces the reference's Lightning stack (ref: model_training/train/
{trainer.py, base_lightning_model.py, fear_lightning_model.py}): epoch loop,
per-step metric logging, best/worst-batch mosaics, true online-tracking
validation over real sequences, plateau LR, early stopping, top-k Orbax
checkpoints, per-epoch dataset resampling and the dynamic-frame-offset
curriculum.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.core.geometry import bbox_iou
from feartracker_tpu.data.dataset import ConcatDataset, get_training_datasets, read_img
from feartracker_tpu.data.device_augs import STAGED_SEARCH_BBOX_KEY, STAGED_SEARCH_KEY
from feartracker_tpu.data.loader import BatchLoader, prefetch_to_device
from feartracker_tpu.data.sequence import get_sequence_datasets
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.parallel import multihost
from feartracker_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.tracker import FEARTracker
from feartracker_tpu.train.callbacks import BestWorstMiner, EarlyStopping
from feartracker_tpu.train.checkpoint import CheckpointManager
from feartracker_tpu.train.metrics import DatasetAwareSums
from feartracker_tpu.train.optim import (
    PlateauScheduler,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)
from feartracker_tpu.train.step import create_train_state, make_train_step
from feartracker_tpu.utils import constants as C
from feartracker_tpu.utils.logging import create_logger

logger = create_logger(__name__)

_DEVICE_KEYS = (
    C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY,
    C.TRACKER_TARGET_SEARCH_IMAGE_KEY,
    C.TARGET_CLASSIFICATION_KEY,
    C.TARGET_REGRESSION_LABEL_KEY,
    C.TARGET_REGRESSION_WEIGHT_KEY,
    C.TRACKER_TARGET_BBOX_KEY,
    C.TARGET_VISIBILITY_KEY,
    C.TRACKER_TARGET_AUX_IMAGE_KEY,
    STAGED_SEARCH_KEY,  # device-augs staged batch (data/device_augs.py)
    STAGED_SEARCH_BBOX_KEY,
)


def _host_local_rows(x) -> np.ndarray:
    """Per-sample step output → this host's rows as numpy.

    Single process: the whole array. Multi-host: step outputs with
    ``P(DATA_AXIS)`` specs are GLOBAL batch arrays whose non-local shards
    cannot be fetched — concatenate only the addressable shards (this host's
    contribution, in global order, which preserves local batch order under
    ``make_array_from_process_local_data``).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


class _NullWriter:
    """No-op TB writer for non-master hosts."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        if config.get("platform"):
            jax.config.update("jax_platforms", config["platform"])

        # multi-host: one process per host, global mesh over every chip of
        # the slice (≙ the reference's DDP backend configs, SURVEY.md §2.3)
        dist_cfg = config.get("distributed") or {}
        if dist_cfg.get("enabled"):
            multihost.initialize(dist_cfg)
        self.is_master = multihost.is_master()

        n_dev = int(config.get("num_devices", 0)) or (
            len(jax.devices()) if dist_cfg.get("enabled") else 1
        )
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        sync_bn = bool(config.get("sync_bn", False)) and self.mesh is not None

        dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
            str(config.get("precision", "float32")), None
        )
        model_cfg = config.get("model", {})
        from feartracker_tpu.models.fbnet import TRUNKS

        trunk = TRUNKS[model_cfg.get("name", "fear_xs")]
        model_kw = dict(
            trunk_blocks=trunk,
            adjust_channels=int(model_cfg.get("adjust_channels", 256)),
            towernum=int(model_cfg.get("towernum", 2)),
        )
        self.model = FEARNet(dtype=dtype, bn_axis_name=DATA_AXIS if sync_bn else None, **model_kw)
        # the val tracker runs the full-precision graph
        self.val_model = FEARNet(**model_kw)

        opt_cfg = dict(config.get("optimizer", {}))
        sched_cfg = dict(config.get("scheduler", {}))
        opt_cfg.setdefault("warmup_steps", sched_cfg.get("warmup_steps", 0))
        # trainer-level key, as the reference exposes it (trainer.py:59)
        opt_cfg.setdefault("gradient_clip_val", config.get("gradient_clip_val", 0.0))
        self.tx = build_optimizer(opt_cfg)
        self.plateau = PlateauScheduler(
            mode=sched_cfg.get("mode", config.get("metric_mode", "max")),
            factor=float(sched_cfg.get("factor", 0.5)),
            patience=int(sched_cfg.get("patience", 5)),
            min_lr=float(sched_cfg.get("min_lr", 1e-6)),
        )
        self.early_stopping = EarlyStopping(
            patience=int(config.get("early_stopping", 20)),
            mode=config.get("metric_mode", "max"),
        )
        self.miner = BestWorstMiner()

        tracker_cfg = config.get("tracker", {})
        self.tracker_config = TrackerConfig(
            **{k: v for k, v in tracker_cfg.items() if k in TrackerConfig._fields}
        )

        exp = config.get("experiment", {})
        self.exp_dir = os.path.join(exp.get("folder", "experiments"), exp.get("name", "FEAR"))
        os.makedirs(self.exp_dir, exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(self.exp_dir, config.get("checkpoint_dir", "checkpoints")),
            max_to_keep=int(config.get("save_top_k", 3)),
            metric_mode=config.get("metric_mode", "max"),
        )
        self._writer = None

        from feartracker_tpu.core.box_coder import BoxCoderSpec

        self.box_spec = BoxCoderSpec(
            score_size=int(tracker_cfg.get("score_size", 16)),
            total_stride=int(tracker_cfg.get("total_stride", 16)),
            instance_size=int(tracker_cfg.get("instance_size", 256)),
        )
        # device-side augmentation: random crop/augs/normalize/labels run in
        # the jitted step; the loader emits staged uint8 crops only
        self.device_augs_cfg = None
        if config.get("device_augs", False):
            from feartracker_tpu.data.device_augs import DeviceAugConfig

            ds0 = (config.get("train", {}).get("datasets") or [{}])[0]
            sizes = ds0.get("sizes", {})
            self.device_augs_cfg = DeviceAugConfig(
                search_size=int(sizes.get("search_image_size", tracker_cfg.get("instance_size", 256))),
                scale=float(sizes.get("search_image_scale", 0.2)),
                shift=float(sizes.get("search_image_shift", 32)),
                grid_size=int(ds0.get("regression_weight_label_size", tracker_cfg.get("score_size", 16))),
                total_stride=int(tracker_cfg.get("total_stride", 16)),
            )

        self.train_step = make_train_step(
            self.model,
            self.tx,
            coeffs=config.get("loss", {}).get("coeffs"),
            spec=self.box_spec,
            mesh=self.mesh,
            dual_template=bool(config.get("dual_template", False)),
            device_augs=self.device_augs_cfg,
            aug_seed=int(config.get("seed", 0)),
            guard_non_finite=int(opt_cfg.get("skip_non_finite", 0)) > 0,
        )

        bs = config.get("batch_size", 32)
        self.batch_size = int(bs["train"] if isinstance(bs, dict) else bs)
        self.train_dataset: Optional[ConcatDataset] = None
        self.val_datasets: List[Any] = []
        self.state = None

    # -- setup -------------------------------------------------------------

    @property
    def writer(self):
        if self._writer is None:
            if not self.is_master:
                # non-master hosts compute identical val metrics (to keep
                # plateau/early-stop decisions in sync) but never write
                self._writer = _NullWriter()
            else:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(os.path.join(self.exp_dir, "logs"))
        return self._writer

    def setup_data(self) -> None:
        if self.config.get("dual_template", False):
            # dual-template training needs every dataset to emit the aux
            # template crop; propagate the flag so a partial config can't
            # produce aux-less batches (KeyError at the first step)
            for ds_cfg in self.config.get("train", {}).get("datasets", []):
                ds_cfg["dynamic_template"] = True
        if self.device_augs_cfg is not None:
            # one DeviceAugConfig serves the whole (concatenated) batch, so
            # every dataset must agree on the aug-relevant geometry — the
            # host path honors per-dataset sizes, the device path cannot
            ds_cfgs = self.config.get("train", {}).get("datasets", [])
            ref = self.device_augs_cfg
            for ds_cfg in ds_cfgs:
                sizes = ds_cfg.get("sizes", {})
                got = (
                    int(sizes.get("search_image_size", ref.search_size)),
                    float(sizes.get("search_image_scale", ref.scale)),
                    float(sizes.get("search_image_shift", ref.shift)),
                    int(ds_cfg.get("regression_weight_label_size", ref.grid_size)),
                )
                want = (ref.search_size, ref.scale, ref.shift, ref.grid_size)
                if got != want:
                    raise ValueError(
                        f"device_augs requires identical aug geometry across train "
                        f"datasets; {ds_cfg.get('name', '?')!r} has {got}, expected {want}"
                    )
                ds_cfg["device_augs"] = True
        self.train_dataset = get_training_datasets(self.config, seed=self.config.get("seed", 0))
        self.val_datasets = get_sequence_datasets(self.config.get("val", {}).get("datasets", []))
        logger.info(
            "train samples: %d, val datasets: %s",
            len(self.train_dataset),
            [f"{d.name}({len(d)})" for d in self.val_datasets],
        )

    def setup_state(self, rng_seed: int = 0) -> None:
        t = self.config.get("tracker", {})
        ts = int(t.get("template_size", 128))
        ins = int(t.get("instance_size", 256))
        self.state = create_train_state(
            self.model,
            self.tx,
            jax.random.PRNGKey(rng_seed),
            (1, ts, ts, 3),
            (1, ins, ins, 3),
        )
        # warm-start from recovered FEAR-XS weights — the analog of the
        # reference's pretrained backbone (config/model/fear.yaml:5); BN
        # arrives folded-identity and re-adapts during training
        pretrained = self.config.get("model", {}).get("pretrained_weights")
        if pretrained:
            from feartracker_tpu.convert.load import load_variables, transfer_variables

            try:
                loaded = load_variables(
                    pretrained,  # .mlmodel / .ckpt / .npz / zoo name / Orbax dir
                    channels=int(self.config.get("model", {}).get("adjust_channels", 256)),
                    towernum=int(self.config.get("model", {}).get("towernum", 2)),
                )
            except Exception as first_err:
                # arch-parameterized importers (.mlmodel/.ckpt) must parse the
                # SOURCE's structure; when the target arch differs, retry with
                # the source's natural FEAR-XS shape and let the transfer step
                # reconcile. Log the first error: if the retry also fails (or
                # silently half-loads), the real cause must not be swallowed.
                logger.warning(
                    "load_variables(%r) with target arch params failed (%s: %s); "
                    "retrying with the source's natural FEAR-XS shape",
                    pretrained, type(first_err).__name__, first_err,
                )
                loaded = load_variables(pretrained)
            # non-strict by-path/shape transfer (ref: utils/torch.py:21-24
            # strict=False -> transfer_weights): exact matches copy verbatim
            # (the fear_xs full warm start is bit-identical to a strict load),
            # mismatched heads/trunks keep their fresh init with a loud report
            target = {"params": self.state.params, "batch_stats": self.state.batch_stats}
            merged, report = transfer_variables(loaded, target)
            if not report["transferred"]:
                raise ValueError(
                    f"no weights transferred from {pretrained!r} — source is "
                    f"incompatible with model.name="
                    f"{self.config.get('model', {}).get('name', 'fear_xs')!r} "
                    f"(skipped_shape={len(report['skipped_shape'])}, "
                    f"missing={len(report['missing'])})"
                )
            partial = report["skipped_shape"] or report["missing"] or report["unused"]
            if partial:
                logger.warning(
                    "PARTIAL warm start from %s: %d leaves transferred, "
                    "%d shape-mismatched (kept init: %s%s), %d missing, %d unused",
                    pretrained,
                    len(report["transferred"]),
                    len(report["skipped_shape"]),
                    ", ".join(report["skipped_shape"][:4]),
                    "…" if len(report["skipped_shape"]) > 4 else "",
                    len(report["missing"]),
                    len(report["unused"]),
                )
            self.state = self.state._replace(
                params=jax.tree.map(jnp.asarray, merged["params"]),
                batch_stats=jax.tree.map(jnp.asarray, merged["batch_stats"]),
            )
            logger.info(
                "initialized from pretrained weights: %s (%s)",
                pretrained,
                "partial" if partial else "full",
            )

    def _loader(self) -> BatchLoader:
        # one loader for the whole fit: its internal epoch counter drives the
        # per-epoch reshuffle (a fresh loader every epoch would replay the
        # same permutation)
        if not hasattr(self, "_loader_cache"):
            # per-host disjoint shard of the dataset (≙ DistributedSampler,
            # ref base_lightning_model.py:113-116); batch_size is PER HOST —
            # the global batch seen by the train step is batch_size × hosts
            self._loader_cache = BatchLoader(
                self.train_dataset,
                batch_size=self.batch_size,
                num_workers=int(self.config.get("num_workers", 2)),
                seed=int(self.config.get("seed", 0)),
                host_id=multihost.process_index(),
                num_hosts=multihost.process_count(),
            )
        return self._loader_cache

    # -- epochs ------------------------------------------------------------

    def _steps_per_epoch(self) -> int:
        n = len(self._loader())
        limit = self.config.get("train_percent")
        return max(1, min(n, int(limit))) if limit else n

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        assert self.state is not None
        loader = self._loader()
        n_batches = self._steps_per_epoch()
        log_every = int(self.config.get("log_every_n_steps", 50))
        self.miner.reset()
        dataset_sums = DatasetAwareSums.zeros(len(self._dataset_names()))
        name_to_id = {n: i for i, n in enumerate(self._dataset_names())}

        def _put(batch):
            """Start the (async) host→device transfer of a batch's device
            keys; prefetch_to_device calls this ahead of the consuming step
            so the upload overlaps the previous step's compute."""
            device_batch = {k: batch[k] for k in _DEVICE_KEYS if k in batch}
            if self.mesh is not None:
                device_batch = shard_batch(self.mesh, device_batch)
            else:
                device_batch = jax.device_put(device_batch)
            return batch, device_batch

        depth = int(self.config.get("device_prefetch", 2))
        sums: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        for b, (batch, device_batch) in enumerate(prefetch_to_device(loader, _put, depth)):
            if b >= n_batches:
                break
            self.state, out = self.train_step(self.state, device_batch)

            scalars = {k: float(out[k]) for k in ("loss", "cls_loss", "reg_loss", "box_iou", "failure_rate")}
            for k, v in scalars.items():
                sums[k] = sums.get(k, 0.0) + v
            count += 1
            # per-sample outputs are GLOBAL batch arrays in multi-host; keep
            # only this host's rows (matches the host-local ``batch``). The
            # per-dataset TB metrics therefore cover the master host's shard
            # (scalar metrics above are pmean'd and already global).
            ids = np.asarray([name_to_id.get(n, 0) for n in batch[C.DATASET_NAME_KEY]])
            dataset_sums = dataset_sums.update(
                jnp.asarray(ids),
                jnp.asarray(_host_local_rows(out["ious"])),
                jnp.asarray(_host_local_rows(out["visibility"])),
            )
            if self.device_augs_cfg is None:
                # mosaics render host-side inputs; with on-device augs the
                # final crops/labels never exist on host — skip the miner
                self.miner.update(
                    scalars["loss"],
                    batch,
                    {
                        C.TARGET_CLASSIFICATION_KEY: _host_local_rows(out["cls_map"]),
                        C.TARGET_REGRESSION_LABEL_KEY: _host_local_rows(out["reg_map"]),
                    },
                )
            step = int(self.state.step)
            if step % log_every == 0:
                for k, v in scalars.items():
                    self.writer.add_scalar(f"train/{k}", v, step)
                self.writer.add_scalar("train/lr", get_learning_rate(self.state.opt_state), step)
                logger.info(
                    "epoch %d step %d loss %.4f box_iou %.3f (%.2f s/it)",
                    epoch, step, scalars["loss"], scalars["box_iou"], (time.time() - t0) / max(b + 1, 1),
                )

        epoch_means = {k: v / max(count, 1) for k, v in sums.items()}
        for k, v in dataset_sums.compute(self._dataset_names()).items():
            self.writer.add_scalar(f"train/metrics/{k}", v, epoch)
        if self.miner.best_mosaic is not None:
            self.writer.add_image("train/best_batch", self.miner.best_mosaic, epoch, dataformats="HWC")
            self.writer.add_image("train/worst_batch", self.miner.worst_mosaic, epoch, dataformats="HWC")
        return epoch_means

    def _dataset_names(self) -> List[str]:
        if self.train_dataset is None:
            return ["dataset"]
        return [d.name for d in self.train_dataset.datasets]

    def validate(self, epoch: int) -> Dict[str, float]:
        """True online tracking over val sequences
        (ref: fear_lightning_model.py:93-125).

        ``val_batched: true`` routes validation through the multi-stream scan
        runtime (S sequences tracked together, letterboxed) — the sequential
        per-frame loop costs one device dispatch per frame, which dominates
        wall time on a real TPU; the batched path amortizes it S×chunk-fold.
        """
        assert self.state is not None
        if not self.val_datasets:
            return {}
        if self.config.get("val_batched"):
            return self._validate_batched(epoch)
        variables = {
            "params": jax.tree.map(np.asarray, self.state.params),
            "batch_stats": jax.tree.map(np.asarray, self.state.batch_stats),
        }
        if not hasattr(self, "_val_tracker"):
            self._val_tracker = FEARTracker(self.val_model, variables, self.tracker_config)
        else:
            self._val_tracker.set_variables(variables)
        tracker = self._val_tracker

        max_samples = int(self.config.get("max_val_samples", 200))
        val_percent = self.config.get("val_percent")
        iou_threshold = 0.01
        # multi-host: every host tracks only a process_index-strided subset
        # of each dataset's sequences (1/N the wall time), then the
        # per-sequence rows are allgathered so plateau / early-stop / best-
        # checkpoint decisions stay in lockstep on identical global metrics
        rank, world = multihost.process_index(), multihost.process_count()
        local_rows: List[List[float]] = []  # (dataset_idx, seq_mean_iou, seq_fail)
        for d_idx, ds in enumerate(self.val_datasets):
            n_seq = len(ds)
            if val_percent:
                # cap at val_percent sequences (floor 1) — but an EMPTY val
                # dataset must stay empty, not get indexed
                n_seq = min(n_seq, max(1, int(val_percent)))
            for s in range(rank, n_seq, world):
                files, anno, name = ds[s]
                tracker.initialize(read_img(files[0]), np.asarray(anno[0], int))
                n = min(max_samples, len(files), len(anno))
                ious, fails = [], []
                for i in range(1, n):
                    bbox = tracker.update(read_img(files[i]))["bbox"]
                    iou = bbox_iou(np.asarray(bbox), np.asarray(anno[i], int))
                    ious.append(iou)
                    fails.append(float(iou < iou_threshold))
                if ious:
                    local_rows.append([float(d_idx), float(np.mean(ious)), float(np.mean(fails))])

        rows = multihost.allgather_rows(np.asarray(local_rows, np.float64).reshape(-1, 3))
        metrics: Dict[str, float] = {}
        if len(rows):
            metrics["box_iou"] = float(np.mean(rows[:, 1]))
            self.writer.add_scalar("valid/metrics/box_iou", metrics["box_iou"], epoch)
        for d_idx, ds in enumerate(self.val_datasets):
            sel = rows[rows[:, 0] == d_idx]
            if not len(sel):
                continue
            metrics[f"{ds.name}_box_iou"] = float(np.mean(sel[:, 1]))
            self.writer.add_scalar(f"valid/metrics/{ds.name}_box_iou", np.mean(sel[:, 1]), epoch)
            self.writer.add_scalar(
                f"valid/metrics/{ds.name}_failure_rate", np.mean(sel[:, 2]), epoch
            )
        return metrics

    def _validate_batched(self, epoch: int) -> Dict[str, float]:
        from feartracker_tpu.evaluate.batched_eval import batched_evaluate
        from feartracker_tpu.tracker.runtime import ScanTracker

        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        if not hasattr(self, "_batched_val_tracker"):
            self._batched_val_tracker = ScanTracker(
                self.val_model, variables, self.tracker_config
            )
        else:
            self._batched_val_tracker.set_variables(variables)

        streams = int(self.config.get("val_streams", 16))
        frame_hw = tuple(self.config.get("val_frame_hw", (360, 640)))
        max_samples = int(self.config.get("max_val_samples", 200))
        val_percent = self.config.get("val_percent")  # sanity check / cap
        iou_threshold = 0.01
        # multi-host: each host tracks its process_index-strided shard and the
        # per-sequence rows (mean IoU, failure, precision@20px) are
        # allgathered — identical global metrics at 1/N the tracking cost
        rank, world = multihost.process_index(), multihost.process_count()
        metrics: Dict[str, float] = {}
        local_rows: List[List[float]] = []  # (dataset_idx, seq_mean, seq_fail, seq_prec20)
        for d_idx, ds in enumerate(self.val_datasets):
            res = batched_evaluate(
                self._batched_val_tracker, ds,
                streams=streams, frame_hw=frame_hw, max_frames=max_samples,
                max_sequences=int(val_percent) if val_percent else None,
                sequence_stride=(rank, world),
            )
            prec = res.get("per_sequence_precision_20px", {})
            local_rows += [
                [float(d_idx), float(np.mean(ov)),
                 float(np.mean(np.asarray(ov) < iou_threshold)),
                 float(prec.get(name, np.nan))]
                for name, ov in res["per_sequence"].items()
            ]
        # one collective for every dataset's per-sequence rows
        rows = multihost.allgather_rows(np.asarray(local_rows, np.float64).reshape(-1, 4))
        all_seq_means: List[float] = rows[:, 1].tolist() if len(rows) else []
        for d_idx, ds in enumerate(self.val_datasets):
            sel = rows[rows[:, 0] == d_idx]
            if not len(sel):
                continue
            metrics[f"{ds.name}_box_iou"] = float(np.mean(sel[:, 1]))
            self.writer.add_scalar(f"valid/metrics/{ds.name}_box_iou", metrics[f"{ds.name}_box_iou"], epoch)
            self.writer.add_scalar(
                f"valid/metrics/{ds.name}_failure_rate", float(np.mean(sel[:, 2])), epoch
            )
            if np.isfinite(sel[:, 3]).all():
                # mean over per-sequence precision == the aggregate curve[20]
                metrics[f"{ds.name}_precision_20px"] = float(np.mean(sel[:, 3]))
                self.writer.add_scalar(
                    f"valid/metrics/{ds.name}_precision_20px",
                    metrics[f"{ds.name}_precision_20px"], epoch,
                )
        if not all_seq_means:
            # nothing scorable (e.g. test splits with init-only groundtruth):
            # match the sequential path's {} so fit()'s monitor=None branch
            # handles it instead of a KeyError
            return {}
        metrics["box_iou"] = float(np.mean(all_seq_means))
        self.writer.add_scalar("valid/metrics/box_iou", metrics["box_iou"], epoch)
        return metrics

    def _update_frame_offset(self, epoch: int) -> None:
        """Dynamic frame-offset curriculum (ref: fear_lightning_model.py:266-284)."""
        params = self.config.get("dynamic_frame_offset")
        if not params or self.train_dataset is None:
            return
        if (epoch + 1) >= params["start_epoch"] and (epoch + 1) % params["freq"] == 0:
            for ds in self.train_dataset.datasets:
                old = ds.item_sampler.frame_offset
                ds.item_sampler.frame_offset = min(params["max_value"], old + params["step"])
                logger.info("%s frame_offset %d -> %d", ds.name, old, ds.item_sampler.frame_offset)

    # -- fit ---------------------------------------------------------------

    def fit(self) -> None:
        if self.train_dataset is None:
            self.setup_data()
        if self.state is None:
            self.setup_state(self.config.get("seed", 0))
        # elastic restart: resume the full train state (params, BN stats,
        # optimizer, step) from the 'last' checkpoint when requested
        # (the reference had no optimizer-state resume flow, SURVEY.md §5)
        start_epoch = 0
        if self.config.get("resume", False):
            if multihost.process_count() > 1:
                # a host that cannot see the checkpoint would silently start
                # fresh while others restore — divergent params + epoch
                # counts corrupt pmean'd training. Fail loudly instead.
                from jax.experimental import multihost_utils as mhu

                flags = mhu.process_allgather(
                    jnp.asarray([1 if self.ckpt.has_last() else 0])
                )
                if int(flags.min()) != int(flags.max()):
                    raise RuntimeError(
                        "resume: checkpoint visibility differs across hosts — "
                        "experiment.folder must be a shared filesystem"
                    )
            if self.ckpt.has_last():
                # no exception swallowing: a corrupt/incompatible checkpoint
                # must fail loudly, not silently retrain from scratch
                self.state = self.ckpt.restore_last(self.state)
                # Lightning-faithful epoch resume: max_epochs is TOTAL epochs.
                # The epoch counter comes from checkpoint metadata — deriving
                # it as step // steps_per_epoch silently shifts the epoch,
                # resample replay and curriculum when train_percent, dataset
                # CSVs or batch size changed between runs. The derivation
                # remains only as a fallback for pre-metadata checkpoints.
                meta = self.ckpt.load_meta()
                if meta is not None and "epoch" in meta:
                    start_epoch = int(meta["epoch"])
                else:
                    start_epoch = int(self.state.step) // max(self._steps_per_epoch(), 1)
                    logger.warning(
                        "resume: checkpoint has no epoch metadata; deriving "
                        "epoch %d from step — incorrect if the dataset or "
                        "batch size changed since the crashed run",
                        start_epoch,
                    )
                logger.info(
                    "resumed from last checkpoint at step %d (epoch %d)",
                    int(self.state.step), start_epoch,
                )
                # replay per-epoch dataset state (resample permutations +
                # frame-offset curriculum) and the loader's shuffle counter
                for past in range(start_epoch):
                    self.train_dataset.resample()
                    self._update_frame_offset(past)
                self._loader().epoch = start_epoch
            else:
                logger.info("no checkpoint to resume at %s; starting fresh", self.ckpt.directory)
        self.resumed_epoch = start_epoch

        # sanity val: run a few real tracking sequences before training, so
        # a broken val path fails in seconds not hours
        # (ref: trainer.py:64 num_sanity_val_steps=5)
        sanity = int(self.config.get("sanity_steps", 5))
        if sanity > 0 and self.val_datasets:
            saved = self.config.get("val_percent")
            self.config["val_percent"] = sanity
            logger.info("sanity check: %d val sequences", sanity)
            self.validate(epoch=-1)
            self.config["val_percent"] = saved

        max_epochs = int(self.config.get("max_epochs", 150))
        min_epochs = int(self.config.get("min_epochs", 0))
        val_every = int(self.config.get("check_val_every_n_epoch", 1))  # (ref: trainer.py:69)
        for epoch in range(start_epoch, max_epochs):
            train_metrics = self.train_epoch(epoch)
            val_metrics = self.validate(epoch) if (epoch + 1) % val_every == 0 else {}
            logger.info("epoch %d done: train %s valid %s", epoch, train_metrics, val_metrics)

            # the monitored metric is val box_iou; train box_iou stands in
            # ONLY when there is no val data at all — never mix the two
            # (they are incommensurable and would corrupt plateau/early-stop/
            # best-checkpoint decisions on val-skipped epochs)
            if val_metrics:
                monitor = val_metrics["box_iou"]
            elif not self.val_datasets:
                monitor = train_metrics.get("box_iou", 0.0)
            else:
                monitor = None

            if monitor is not None:
                lr = get_learning_rate(self.state.opt_state)
                new_lr = self.plateau.update(monitor, lr)
                if new_lr != lr:
                    logger.info("plateau: lr %.2e -> %.2e", lr, new_lr)
                    self.state = self.state._replace(
                        opt_state=set_learning_rate(self.state.opt_state, new_lr)
                    )
            # checkpoint ids are GLOBAL steps so a resumed run never collides
            # with pre-crash ids (Orbax silently ignores saves at existing ids).
            # DP state is fully replicated, so master alone writes it
            # (≙ ref rank-0 checkpointing under Lightning DDP)
            if self.is_master:
                self.ckpt.save(
                    int(self.state.step), self.state, monitor,
                    extra={"epoch": epoch + 1},
                )

            if monitor is not None and self.early_stopping.update(monitor) and epoch + 1 >= min_epochs:
                logger.info("early stopping at epoch %d (best %.4f)", epoch, self.early_stopping.best)
                break
            self.train_dataset.resample()
            self._update_frame_offset(epoch)
        if self._writer is not None:
            self._writer.close()


def train(config: Dict[str, Any]) -> Trainer:
    """(ref: model_training/train.py:17-22)"""
    trainer = Trainer(config)
    trainer.fit()
    return trainer
