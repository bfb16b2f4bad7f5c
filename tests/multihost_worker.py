"""Worker process for the REAL multi-host integration test
(tests/test_multihost_real.py). Each process owns 2 virtual CPU devices;
jax.distributed federates them into a 4-device global mesh and the actual
shard_map DP train step (sync-BN, grad pmean) runs over genuinely different
per-host data. Prints one JSON line with the loss and a post-step parameter
checksum — identical checksums across processes prove the DDP semantics.

    python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from feartracker_tpu.parallel import multihost

multihost.initialize(
    {
        "coordinator_address": f"127.0.0.1:{port}",
        "num_processes": nprocs,
        "process_id": pid,
    }
)

import jax.numpy as jnp
import numpy as np

from feartracker_tpu.core import box_coder as bc
from feartracker_tpu.models.fbnet import IRBlockSpec
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from feartracker_tpu.train.optim import build_optimizer
from feartracker_tpu.train.step import create_train_state, make_train_step
from feartracker_tpu.utils import constants as C

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs, jax.device_count()

trunk = (IRBlockSpec(1, 3, 1, 8), IRBlockSpec(2, 3, 2, 12), IRBlockSpec(2, 5, 2, 16))
model = FEARNet(trunk_blocks=trunk, adjust_channels=32, towernum=1, bn_axis_name=DATA_AXIS)
tx = build_optimizer({"name": "adam", "lr": 1e-3})
# same seed on every host -> identical initial params (the DDP contract)
state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3), (1, 64, 64, 3))

spec = bc.BoxCoderSpec(score_size=8, total_stride=8, instance_size=64)
B_local = 2  # per-host batch; global = B_local * nprocs
# per-host DIFFERENT data (host-id-seeded), as the disjoint loaders provide
rng = np.random.RandomState(100 + pid)
gt = np.tile(np.array([[10.0, 12.0, 20.0, 24.0]], np.float32), (B_local, 1))
enc = bc.encode(jnp.asarray(gt), spec)
batch = {
    C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: rng.rand(B_local, 32, 32, 3).astype(np.float32),
    C.TRACKER_TARGET_SEARCH_IMAGE_KEY: rng.rand(B_local, 64, 64, 3).astype(np.float32),
    C.TARGET_REGRESSION_LABEL_KEY: np.asarray(enc.regression_map),
    C.TARGET_CLASSIFICATION_KEY: np.asarray(enc.classification_label),
    C.TARGET_REGRESSION_WEIGHT_KEY: np.asarray(enc.classification_label)[..., 0],
    C.TRACKER_TARGET_BBOX_KEY: gt,
    C.TARGET_VISIBILITY_KEY: np.ones((B_local, 1), np.float32),
}

mesh = make_mesh(2 * nprocs)
step = make_train_step(model, tx, spec=spec, mesh=mesh)
for _ in range(2):
    state, metrics = step(state, shard_batch(mesh, batch))

# fully-addressable reductions (params are replicated on every device)
param_sum = float(sum(np.abs(np.asarray(p)).sum() for p in jax.tree.leaves(state.params)))
bn_sum = float(sum(np.abs(np.asarray(p)).sum() for p in jax.tree.leaves(state.batch_stats)))

# the sharded-validation gather, over the REAL collective: hosts contribute
# DIFFERENT row counts (pid+1 rows each) and must all see the same global
# row set (order is by process rank)
val_rows = multihost.allgather_rows(
    np.array([[float(pid), 0.5 + pid + 0.1 * r, float(r)] for r in range(pid + 1)])
)

print(json.dumps({
    "pid": pid,
    "loss": float(metrics["loss"]),
    "param_sum": round(param_sum, 6),
    "bn_sum": round(bn_sum, 6),
    "step": int(state.step),
    "val_rows": np.asarray(val_rows).tolist(),
}))
