"""Multi-host training wiring (mocked process topology).

Real multi-process launches need a pod; these tests mock
``parallel.multihost.process_index/process_count`` (the seam the Trainer
reads) to prove the DistributedSampler-equivalent behavior
(ref: base_lightning_model.py:53-58, 113-116):

* per-host loaders read disjoint, jointly-exhaustive dataset shards;
* a host-sharded loader feeds the real shard_map DP train step unchanged;
* non-master hosts never write TB logs or checkpoints.
"""

import os

import numpy as np
import pandas as pd
import pytest

from tests.test_trainer_integration import _make_track_images, _make_val_sequences


@pytest.fixture(scope="module")
def mh_config(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("multihost"))
    rows = _make_track_images(root, n_tracks=2, n_frames=6)
    csv_path = os.path.join(root, "train.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    _make_val_sequences(os.path.join(root, "got10k", "val"))
    return {
        "platform": "",
        "num_devices": 4,
        "sync_bn": True,
        "seed": 0,
        "model": {"name": "fear_tiny", "adjust_channels": 24, "towernum": 1},
        "tracker": {
            "score_size": 8, "total_stride": 8, "instance_size": 64, "template_size": 32,
        },
        "optimizer": {"name": "adam", "lr": 1e-3},
        "batch_size": 4,
        "num_workers": 1,
        "max_epochs": 1,
        "max_val_samples": 3,
        "log_every_n_steps": 1,
        "experiment": {"folder": os.path.join(root, "exp"), "name": "MH"},
        "train": {
            "datasets": [
                {
                    "name": "synthetic",
                    "root": root,
                    "sizes": {
                        "search_image_size": 64, "template_image_size": 32,
                        "search_context": 2, "template_bbox_offset": 0.2,
                        "search_image_shift": 8, "search_image_scale": 0.2,
                        "context_range": 1,
                    },
                    "regression_weight_label_size": 8,
                    "sampling": {
                        "type": "track", "data_path": csv_path, "negative_ratio": 0,
                        "frame_offset": 4, "num_samples": 8, "clip_range": True,
                    },
                }
            ]
        },
        "val": {"datasets": []},
    }


def _mock_host(monkeypatch, index: int, count: int):
    from feartracker_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "process_index", lambda: index)
    monkeypatch.setattr(multihost, "process_count", lambda: count)


def test_per_host_loaders_are_disjoint_and_exhaustive(mh_config, monkeypatch):
    from feartracker_tpu.train.loop import Trainer

    n_hosts = 4
    shards = []
    for host in range(n_hosts):
        _mock_host(monkeypatch, host, n_hosts)
        trainer = Trainer({**mh_config, "num_devices": 1})
        trainer.setup_data()
        loader = trainer._loader()
        assert loader.host_id == host and loader.num_hosts == n_hosts
        shards.append(set(loader._indices().tolist()))
    union = set().union(*shards)
    assert union == set(range(len(trainer.train_dataset)))
    for a in range(n_hosts):
        for b in range(a + 1, n_hosts):
            assert not (shards[a] & shards[b])


def test_host_sharded_loader_drives_shard_map_step(mh_config, monkeypatch):
    """Host 0 of 2: loader yields its half of the data; the real shard_map DP
    train step (sync-BN, grad pmean over the 4-device mesh) consumes it."""
    from feartracker_tpu.train.loop import Trainer

    _mock_host(monkeypatch, 0, 2)
    trainer = Trainer(mh_config)
    trainer.setup_data()
    trainer.setup_state(0)
    metrics = trainer.train_epoch(0)
    assert int(trainer.state.step) >= 1
    assert np.isfinite(metrics["loss"])


def test_non_master_host_writes_nothing(mh_config, monkeypatch):
    from feartracker_tpu.train.loop import Trainer, _NullWriter

    _mock_host(monkeypatch, 1, 2)
    trainer = Trainer({**mh_config, "num_devices": 1})
    assert not trainer.is_master
    assert isinstance(trainer.writer, _NullWriter)
    # checkpoint saves are master-gated in fit(); prove the gate variable
    # drives it by running one fit on an empty val set
    trainer.setup_data()
    trainer.setup_state(0)
    trainer.fit()
    assert not os.listdir(trainer.ckpt.directory) or not trainer.ckpt.has_last()


def test_host_local_rows_preserves_shard_order(monkeypatch):
    """_host_local_rows on a batch-sharded global array returns rows in
    global-index order (in one process every shard is addressable, so the
    result must equal the full array)."""
    import jax
    import jax.numpy as jnp

    from feartracker_tpu.parallel.mesh import batch_sharding, make_mesh
    from feartracker_tpu.train import loop as L

    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    monkeypatch.setattr(L.jax, "process_count", lambda: 2)
    out = L._host_local_rows(xs)
    np.testing.assert_array_equal(out, np.asarray(x))


def test_distributed_initialize_is_idempotent(monkeypatch):
    from feartracker_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost, "_initialized", False)
    monkeypatch.setattr(
        multihost.jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    multihost.initialize({"coordinator_address": "host:1234", "num_processes": 2, "process_id": 0})
    multihost.initialize({"coordinator_address": "host:1234"})
    assert calls == [{"coordinator_address": "host:1234", "num_processes": 2, "process_id": 0}]
