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
