"""Checkpoint I/O: Orbax-backed top-k checkpointing + PyTorch-Lightning
import.

Replaces the reference's Lightning ``ModelCheckpointCallback`` (ref:
train/callbacks.py:19-67: monitor ``valid/metrics/box_iou``, ``save_top_k``,
``save_last``) and the fragile ``load_from_lighting`` loader (ref:
utils/torch.py:12-25, which strips the ``model.`` prefix with a char-set
``lstrip``). Unlike the reference — which saved weights only — the full train
state (params, batch_stats, opt_state, step) is stored, so training resumes
exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        metric_mode: str = "max",
        save_last: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.metric_mode = metric_mode
        best_fn = (lambda m: m["monitor"]) if metric_mode == "max" else (lambda m: -m["monitor"])
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self.save_last = save_last
        self._last_dir = os.path.join(self.directory, "last")

    def has_last(self) -> bool:
        return os.path.exists(os.path.join(self._last_dir, "state"))

    def save(
        self,
        step: int,
        state,
        monitor: Optional[float],
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Save 'last' always; enter the managed top-k ranking only when a
        monitored metric is available for this step. ``extra`` is a small
        JSON-able dict (epoch / loader counters) stored beside the last
        state so resume does not have to DERIVE them from the step — a
        step-derived epoch silently shifts when train_percent, dataset CSVs
        or batch size changed between the crashed and resumed run."""
        if monitor is not None:
            self._mgr.save(
                step,
                args=ocp.args.StandardSave(jax.tree.map(np.asarray, state._asdict())),
                metrics={"monitor": float(monitor)},
            )
            self._mgr.wait_until_finished()
        if self.save_last:
            ckptr = ocp.StandardCheckpointer()
            path = os.path.join(self._last_dir, "state")
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            ckptr.save(path, jax.tree.map(np.asarray, state._asdict()))
            ckptr.wait_until_finished()
            if extra is not None:
                # atomic write: a crash between the state save and this
                # point must never leave a TRUNCATED meta.json behind
                path = os.path.join(self._last_dir, "meta.json")
                tmp = path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(extra, fh)
                os.replace(tmp, path)

    def load_meta(self) -> Optional[Dict[str, Any]]:
        """The ``extra`` dict stored with the last checkpoint, if any
        (absent for checkpoints written before epoch persistence; None too
        for an unreadable/corrupt file — resume then falls back to the
        step-derived epoch)."""
        path = os.path.join(self._last_dir, "meta.json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, ValueError, OSError):
            return None

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_like, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (a TrainState)."""
        step = step if step is not None else self._mgr.best_step()
        target = jax.tree.map(np.asarray, state_like._asdict())
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return type(state_like)(**restored)

    def restore_last(self, state_like) -> Any:
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, state_like._asdict())
        restored = ckptr.restore(os.path.join(self._last_dir, "state"), target)
        return type(state_like)(**restored)


def load_orbax_variables(path: str) -> Dict[str, Any]:
    """Load inference variables ``{"params", "batch_stats"}`` from a training
    checkpoint written by :class:`CheckpointManager` (StandardSave of the
    TrainState dict, so no target structure is needed to restore).

    Accepts any of: the state dir itself, a ``checkpoints`` root (resolves
    ``last/state``), an experiment dir (resolves ``checkpoints/last/state``),
    or a managed step dir (``<root>/<step>`` — resolves its ``default``
    item). Raises FileNotFoundError listing what was tried.
    """
    candidates = [
        path,
        os.path.join(path, "state"),
        os.path.join(path, "default"),  # ocp.CheckpointManager step item
        os.path.join(path, "last", "state"),
        os.path.join(path, "checkpoints", "last", "state"),
    ]
    ckptr = ocp.StandardCheckpointer()
    for cand in candidates:
        if os.path.isdir(cand) and os.path.exists(os.path.join(cand, "_METADATA")):
            restored = ckptr.restore(cand)
            missing = {"params", "batch_stats"} - set(restored)
            if missing:
                raise ValueError(f"checkpoint at {cand} lacks {sorted(missing)}")
            return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    raise FileNotFoundError(
        f"no Orbax state found; tried: {', '.join(candidates)}"
    )


def load_lightning_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference PyTorch-Lightning ``.ckpt`` and return the model's
    flat state dict (``model.`` prefix removed properly — the reference's
    ``lstrip("model")`` also eats leading 'm/o/d/e/l' chars of parameter
    names; we split on the first dot instead). Torch is used only as a
    deserializer. (ref: utils/torch.py:12-25)"""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            out[k[len("model.") :]] = v.numpy()
    return out
