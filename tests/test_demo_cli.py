"""demo_video.py CLI smoke test — the reference's primary user entry
(ref: demo_video.py, README.md:30-32), driven as a real subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO = "/root/reference/assets/test.mp4"
GOLDEN = os.path.join(REPO, "tests", "golden", "reference_trajectory.json")

needs_assets = pytest.mark.skipif(
    not os.path.exists(VIDEO), reason="reference assets not mounted"
)


@needs_assets
def test_demo_cli_tracks_and_writes_video(tmp_path):
    out = str(tmp_path / "out.mp4")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, "demo_video.py", "--platform", "cpu",
         "--max_frames", "12", "--output_path", out,
         "--initial_bbox", "163", "53", "45", "174", "--video_path", VIDEO],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    # the printed final bbox bit-matches the reference-oracle golden
    gold = json.load(open(GOLDEN))
    expect = gold["boxes"][10]  # 11th update = frame 12's box
    last = r.stdout.strip().splitlines()[-1]
    assert "final bbox" in last, r.stdout[-500:]
    got = [int(v) for v in last.split("[")[1].rstrip("]").split(",")]
    np.testing.assert_array_equal(got, expect)


@needs_assets
def test_demo_cli_multiobject(tmp_path):
    """N×4 --initial_bbox tracks N objects via the shared-frame scan runtime;
    object 0 must land within a few px of the host-path golden (the scan
    runtime's mm-crop differs from the host crop by float rounding only;
    bit-level stream independence of the shared-frame mode is pinned in
    tests/test_serving.py::test_multiobject_shared_frames_match_tiled)."""
    out = str(tmp_path / "multi.mp4")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, "demo_video.py", "--platform", "cpu",
         "--max_frames", "12", "--output_path", out,
         "--initial_bbox", "163", "53", "45", "174", "60", "40", "80", "90",
         "--video_path", VIDEO],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    lines = [l for l in r.stdout.strip().splitlines() if "final bbox [" in l]
    assert len(lines) == 2, r.stdout[-500:]
    gold = json.load(open(GOLDEN))
    got = [int(v) for v in lines[0].split(": [")[1].rstrip("]").split(",")]
    np.testing.assert_allclose(got, gold["boxes"][10], atol=5)
