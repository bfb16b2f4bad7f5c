"""Online tracker integration tests: golden trajectory on the reference's
test video with the recovered FEAR-XS weights (SURVEY.md §4 test strategy (c))."""

import os

import numpy as np
import pytest

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
VIDEO = "/root/reference/assets/test.mp4"

needs_assets = pytest.mark.skipif(
    not (os.path.exists(TRACKER_ML) and os.path.exists(VIDEO)),
    reason="reference assets not mounted",
)

# CPU-float32 trajectory of the first 24 updates on assets/test.mp4 starting
# from demo_video.py's default bbox [163, 53, 45, 174]. Regenerate with the
# snippet in this file's git history if the numerics intentionally change.
GOLDEN = [
    [161, 58, 47, 166], [163, 58, 49, 166], [162, 57, 51, 167], [165, 55, 48, 169],
    [165, 54, 49, 171], [169, 52, 44, 171], [168, 54, 44, 167], [167, 56, 42, 163],
    [167, 57, 42, 163], [164, 58, 42, 160], [163, 57, 42, 162], [157, 56, 43, 162],
    [157, 55, 43, 162], [154, 62, 41, 152], [154, 58, 41, 157], [150, 58, 42, 156],
    [150, 57, 41, 157], [148, 54, 41, 160], [147, 54, 41, 160], [149, 56, 38, 158],
    [148, 55, 39, 159], [148, 62, 39, 152], [147, 62, 39, 153], [147, 60, 39, 152],
]


@pytest.fixture(scope="module")
def tracked_boxes():
    from feartracker_tpu.convert.fear_weights import load_fear_xs
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.tracker import FEARTracker
    from feartracker_tpu.utils.video import read_video

    video = read_video(VIDEO, max_frames=25)
    tracker = FEARTracker(FEARNet(), load_fear_xs(TRACKER_ML))
    tracker.initialize(video[0], np.array([163, 53, 45, 174]))
    out = []
    confs = []
    for i in range(1, 25):
        r = tracker.update(video[i])
        out.append(list(map(int, r["bbox"])))
        confs.append(r["confidence"])
    return out, confs


@needs_assets
def test_golden_trajectory(tracked_boxes):
    boxes, _ = tracked_boxes
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(GOLDEN), atol=2)


@needs_assets
def test_high_confidence_on_clean_sequence(tracked_boxes):
    _, confs = tracked_boxes
    assert min(confs) > 0.9


@needs_assets
def test_boxes_stay_in_frame(tracked_boxes):
    boxes, _ = tracked_boxes
    b = np.asarray(boxes)
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 0] + b[:, 2] <= 480).all()
    assert (b[:, 1] + b[:, 3] <= 256).all()


# smooth-mode (penalty/window/size-smoothing) golden trajectory, first 14
# updates — BASELINE config 2
GOLDEN_SMOOTH = [
    [161, 58, 46, 169], [163, 60, 47, 166], [163, 58, 49, 166], [165, 55, 48, 168],
    [165, 55, 48, 168], [169, 54, 46, 168], [168, 54, 45, 167], [167, 59, 44, 163],
    [167, 56, 44, 164], [163, 59, 43, 162], [163, 60, 42, 160], [157, 54, 42, 162],
    [157, 57, 42, 161], [155, 62, 41, 156],
]


@needs_assets
def test_golden_trajectory_smooth_mode():
    from feartracker_tpu.convert.fear_weights import load_fear_xs
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.tracker import FEARTracker
    from feartracker_tpu.utils.video import read_video

    video = read_video(VIDEO, max_frames=15)
    tracker = FEARTracker(FEARNet(), load_fear_xs(TRACKER_ML), TrackerConfig(smooth=True))
    tracker.initialize(video[0], np.array([163, 53, 45, 174]))
    boxes = [list(map(int, tracker.update(video[i])["bbox"])) for i in range(1, 15)]
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(GOLDEN_SMOOTH), atol=2)
