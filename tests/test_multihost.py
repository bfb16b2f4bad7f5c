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


def test_sharded_validation_matches_redundant_path(mh_config, monkeypatch, tmp_path):
    """Each host tracks a process_index-strided val shard (1/N sequences) and
    the allgathered rows reproduce the single-host metrics exactly — lockstep
    plateau/early-stop at a fraction of the per-host cost (VERDICT r2 #7)."""
    from feartracker_tpu.parallel import multihost
    from feartracker_tpu.train.loop import Trainer

    root = str(tmp_path)
    _make_val_sequences(os.path.join(root, "got10k", "val"), n_seq=3)
    cfg = {
        **mh_config,
        "num_devices": 1,
        "experiment": {"folder": os.path.join(root, "exp"), "name": "SHVAL"},
        "val": {"datasets": [{"name": "got10k", "root_dir": os.path.join(root, "got10k"), "subset": "val"}]},
    }

    def run_host(index, count, capture):
        _mock_host(monkeypatch, index, count)
        monkeypatch.setattr(
            multihost, "allgather_rows",
            lambda rows: capture.append(np.asarray(rows, np.float64).reshape(-1, 3)) or capture[-1],
        )
        t = Trainer(cfg)
        t.setup_data()
        t.setup_state(0)
        t.validate(0)

    full = []
    run_host(0, 1, full)

    shards = []
    for h in range(2):
        cap = []
        run_host(h, 2, cap)
        shards.append(cap[0])
        assert 0 < len(cap[0]) < len(full[0])  # a strict subset per host

    combined = np.concatenate(shards, axis=0)
    assert len(combined) == len(full[0])  # disjoint + exhaustive
    # identical global metric to the redundant path (same seqs, same weights)
    assert np.isclose(np.mean(combined[:, 1]), np.mean(full[0][:, 1]))
    assert set(map(tuple, combined.tolist())) == set(map(tuple, full[0].tolist()))


def test_allgather_rows_single_process_passthrough():
    from feartracker_tpu.parallel.multihost import allgather_rows

    rows = np.array([[0.0, 0.5, 0.1], [1.0, 0.7, 0.0]])
    out = allgather_rows(rows)
    # values ride the collective as float32 by contract (config-independent)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, rows.astype(np.float32))
    assert allgather_rows(np.zeros((0, 3))).shape[0] == 0
    with np.testing.assert_raises(ValueError):
        allgather_rows(np.zeros(3))


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
