"""evaluate CLI smoke tests — `python -m feartracker_tpu.evaluate.cli` as a
real subprocess on a generated GOT-10k-layout dataset (the reference's
`evaluate/macs_params.py` + got10k-toolkit flows, ref README.md:51-58)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=540):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    return subprocess.run(
        [sys.executable, "-m", "feartracker_tpu.evaluate.cli", "--platform", "cpu"] + args,
        capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout,
    )


@pytest.fixture(scope="module")
def got10k_root(tmp_path_factory):
    sys.path.insert(0, REPO)
    from tools.make_synthetic_dataset import generate

    root = tmp_path_factory.mktemp("evalcli")
    generate(str(root), tracks=1, frames=6, val_sequences=2, seed=9, size=(96, 128))
    return str(root / "got10k")


def test_eval_cli_sequential_with_report(got10k_root, tmp_path):
    report = str(tmp_path / "res.json")
    r = _run(["eval", "--dataset", "got10k", "--root", got10k_root,
              "--subset", "val", "--max_frames", "6", "--report", report])
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.load(open(report))
    assert res["num_sequences"] == 2
    assert 0.0 <= res["ao"] <= 1.0 and "per_sequence" in res


def test_eval_cli_supervised(got10k_root):
    r = _run(["eval", "--dataset", "got10k", "--root", got10k_root,
              "--subset", "val", "--max_frames", "6", "--supervised"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout.strip().splitlines()
    payload = json.loads(out[-1])
    assert {"accuracy", "robustness_failures", "eao"} <= set(payload)


def test_eval_cli_flag_conflicts(got10k_root):
    r = _run(["eval", "--dataset", "got10k", "--root", got10k_root,
              "--batched", "--submit_dir", "/tmp/x"])
    assert r.returncode != 0
    assert "drop --batched" in (r.stderr + r.stdout)
