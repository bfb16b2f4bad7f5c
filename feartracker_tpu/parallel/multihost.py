"""Multi-host (multi-process) training support.

The reference's multi-node story is Lightning DDP: one process per GPU, a
``DistributedSampler(world_size, rank)`` carving the dataset per rank, and
rank-0-only logging/checkpointing (ref: base_lightning_model.py:53-58,
113-116; config/backend/2gpu.yaml). The TPU-native equivalent (SURVEY.md
§2.3):

* ``jax.distributed.initialize()`` — one process per host, all chips of the
  slice form one global mesh;
* per-host data sharding — each host's ``BatchLoader`` reads a disjoint
  ``process_index``-strided slice of the dataset (≙ DistributedSampler);
* ``jax.make_array_from_process_local_data`` — each host's local batch
  becomes its shard of the global batch-sharded array; XLA's ``pmean`` inside
  the shard_map train step then reduces gradients over ICI/DCN exactly as on
  a single host.

Everything here is a thin, monkeypatch-friendly seam: tests mock
``process_index``/``process_count`` to prove disjoint sharding and
master-gating without a real multi-process launch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

_initialized = False


def initialize(config: Dict[str, Any]) -> None:
    """``jax.distributed.initialize`` from config (idempotent).

    Config keys (all optional — on TPU pods JAX autodetects them from the
    environment): ``coordinator_address``, ``num_processes``, ``process_id``,
    ``local_device_ids``.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {
        k: config[k]
        for k in ("coordinator_address", "num_processes", "process_id", "local_device_ids")
        if config.get(k) is not None
    }
    jax.distributed.initialize(**kwargs)
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_master() -> bool:
    """Rank-0 check gating logging/checkpoint/TB writes
    (≙ ref base_lightning_model.py:53-58 ``is_master``)."""
    return process_index() == 0


def allgather_rows(rows) -> "np.ndarray":
    """Gather per-host (N_host, C) float row-blocks of VARYING row counts
    into one global (sum_rows, C) array, identical on every host. ``rows``
    must already be 2-D with the same column count on every host (callers
    ``reshape(-1, C)`` so empty blocks keep their width).

    Used to shard online validation: each host tracks a process_index-strided
    subset of the val sequences and contributes its per-sequence rows; the
    gathered result feeds plateau/early-stop decisions in lockstep at 1/N
    the per-host tracking cost. Single-process: returns the input unchanged
    (no device ops). Multi-process: NaN-pads every host's block to the global
    max row count, ``process_allgather``s once, strips padding. Values ride
    the collective as float32 (JAX x64 is off) — metric precision, which is
    all the validation rows need.
    """
    import numpy as np

    rows = np.asarray(rows, np.float32)  # explicit: config-independent dtype
    if rows.ndim != 2:
        raise ValueError(f"rows must be (N, C), got shape {rows.shape}")
    if process_count() == 1:
        return rows
    from jax.experimental import multihost_utils as mhu

    counts = np.asarray(mhu.process_allgather(np.asarray([rows.shape[0]]))).reshape(-1)
    padded = np.full((int(counts.max()), rows.shape[1]), np.nan, np.float32)
    padded[: rows.shape[0], :] = rows
    gathered = np.asarray(mhu.process_allgather(padded))  # (P, max_rows, C)
    return np.concatenate(
        [gathered[p, : counts[p]] for p in range(gathered.shape[0])], axis=0
    )
