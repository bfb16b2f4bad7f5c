"""bench.py provenance: a random-weights fallback run must be marked
``weights: random`` and earn zero vs_baseline credit (it would otherwise be
indistinguishable from a real FEAR-XS run in BENCH_r*.json)."""

import json
import os
import subprocess
import sys

import pytest


def _run_bench(monkeypatched_weights: bool, tmp_path):
    env = {
        "BENCH_WARMUP": "1",
        "BENCH_TIMED": "1",
        "BENCH_STREAMS": "2",
        "BENCH_CHUNK": "2",
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "JAX_PLATFORMS": "",
        "XLA_FLAGS": "",
    }
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import feartracker_tpu.convert.fear_weights as fw\n"
    )
    if monkeypatched_weights:
        # break BOTH trained-weight sources: the CoreML recovery and the
        # packaged standalone archive (which exists precisely so that a
        # missing reference mount does NOT degrade to random weights)
        code += (
            "def _boom(*a, **k): raise IOError('weights unavailable')\n"
            "fw.load_fear_xs = _boom\n"
            "import feartracker_tpu.convert.load as cl\n"
            "cl.load_npz_variables = _boom\n"
        )
    # bench imports load_fear_xs inside main(), so patching the source module
    # above is sufficient
    code += "import bench; bench.main()\n"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_random_weights_run_is_marked_and_uncredited(tmp_path):
    rec = _run_bench(monkeypatched_weights=True, tmp_path=tmp_path)
    assert rec["weights"] == "random"
    assert rec["vs_baseline"] == 0.0
    assert rec["value"] > 0


@pytest.mark.skipif(
    not os.path.exists("/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"),
    reason="reference assets not mounted",
)
def test_real_weights_run_is_marked(tmp_path):
    rec = _run_bench(monkeypatched_weights=False, tmp_path=tmp_path)
    assert rec["weights"] == "fear_xs"
    assert rec["vs_baseline"] > 0
