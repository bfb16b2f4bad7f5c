"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(ref: config/backend/2gpu.yaml, base_lightning_model.py:113-116, SURVEY.md
§2.2-2.3). The TPU-native equivalent: a 1-D ``data`` mesh over ICI, batch
sharded along it, parameters replicated, gradient ``pmean`` and cross-replica
BatchNorm (≙ ``sync_bn``) riding XLA collectives. The helpers here are also
used by the multi-stream inference runtime to shard streams across chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, axis: str = DATA_AXIS, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch / streams) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Device-put a pytree of (B, ...) arrays with B split over the mesh.

    Single process: plain sharded ``device_put``. Multi-host (the mesh spans
    processes): each process contributes its LOCAL batch as its shard of the
    global array via ``jax.make_array_from_process_local_data`` — the global
    batch is ``local_B × process_count`` and per-host loaders must feed
    disjoint data (see parallel/multihost.py and data/loader.py host_id).
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
