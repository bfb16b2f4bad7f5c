"""REAL multi-process data-parallel training: two OS processes, each with 2
virtual CPU devices, federated by ``jax.distributed`` into one 4-device mesh
(Gloo CPU collectives). Complements tests/test_multihost.py's mocked-topology
tests with the genuine article: cross-process ``make_array_from_process_local
_data`` batches, shard_map grad pmean and sync-BN, and the DDP invariant that
every host ends with bit-identical parameters despite different local data.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_training_identical_params():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert np.isfinite(o["loss"]) and o["step"] == 2
    # pmean'd loss is a global scalar: identical on both hosts
    assert by_pid[0]["loss"] == pytest.approx(by_pid[1]["loss"], rel=1e-6)
    # the DDP contract: same initial params + pmean'd grads + sync-BN
    # -> hosts stay bit-identical even though their local batches differ
    assert by_pid[0]["param_sum"] == by_pid[1]["param_sum"]
    assert by_pid[0]["bn_sum"] == by_pid[1]["bn_sum"]
    # sharded-validation gather over the real collective: host 0 contributed
    # 1 row, host 1 contributed 2; every host sees the identical global set
    # (float32 through the collective — metric precision, not bit-parity)
    expect = [[0.0, 0.5, 0.0], [1.0, 1.5, 0.0], [1.0, 1.6, 1.0]]
    np.testing.assert_allclose(by_pid[0]["val_rows"], expect, atol=1e-6)
    assert by_pid[0]["val_rows"] == by_pid[1]["val_rows"]
