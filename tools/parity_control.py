"""The identical-model-outputs control for smooth-mode trajectory parity.

The smooth-mode golden (tests/golden/reference_trajectory_smooth.json) shows
638/660 frames bit-exact between the repo tracker and the reference tracker
run through tools/reference_oracle.py. Two explanations compete:

  (a) the repo's crop/penalty/window/smoothing/decode path differs from the
      reference's (base_tracker.py:126-205, fear_tracker.py:74-86), or
  (b) the decode path is bit-parity and the divergence is model-forward
      float noise (XLA NHWC convs vs the oracle's torch NCHW interpreter,
      <=2e-3 on logits) amplified by the lr*penalty*cls smoothing feedback.

This tool decides it: it runs the REPO tracker (repo cv2 crop, repo JAX
postprocess/decode — the production path) but serves the model forward from
the SAME torch-interpreter CoreML graphs the oracle uses, so both trackers
see bit-identical cls/reg maps every frame. If the resulting trajectory
matches the oracle golden on every frame, (b) is proven and the decode path
is bit-parity (SURVEY.md §7 hard part #1).

Usage:
  python tools/parity_control.py [--max_frames 661] [--no-smooth]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

try:  # no-op under the test conftest, which already forced the CPU platform
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from feartracker_tpu.core import postprocess as pp
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.tracker import FEARTracker
from feartracker_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

REF = "/root/reference"
TRACKER_ML = f"{REF}/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
INIT_ML = f"{REF}/evaluate/FEARDemo/FEARDemo/TrackerInit.mlmodel"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _normalize_np(img: np.ndarray) -> np.ndarray:
    """albumentations.Normalize semantics, bit-identical to the oracle's shim
    (tools/reference_oracle.py _Normalize): (img - mean*255) / (std*255)."""
    mean = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std = np.asarray(IMAGENET_STD, np.float32) * 255.0
    return (img.astype(np.float32) - mean) / std


class InterpreterModelTracker(FEARTracker):
    """The repo's host tracker with its Flax model swapped for the oracle's
    torch-interpreter CoreML graphs. Crop (cv2, data/crops.py) and decode
    (core/postprocess.py, jitted) are the repo's production path; only the
    conv net runs in torch — the control that pins the 638/660 divergence on
    model-forward float noise rather than the decode path."""

    def __init__(self, config: TrackerConfig = TrackerConfig()):
        from feartracker_tpu.convert.coreml import parse_mlmodel
        from feartracker_tpu.convert.fear_weights import load_fear_xs
        from feartracker_tpu.models.fear_net import FEARNet

        super().__init__(FEARNet(), load_fear_xs(TRACKER_ML), config)
        self._init_layers = [
            l for l in parse_mlmodel(INIT_ML)["layers"] if l.name != "scale_layer"
        ]
        self._track_layers = [
            l for l in parse_mlmodel(TRACKER_ML)["layers"] if l.name != "scale_layer"
        ]
        self._pp_jit = jax.jit(
            lambda cls, reg, prev: pp.postprocess(
                cls, reg, self.config.postprocess, prev_size=prev
            )
        )
        # replace the jitted Flax forward with the interpreter forward
        self._features_fn = self._interp_features
        self._step_fn = self._interp_step

    def _interp_features(self, crop_u8) -> np.ndarray:
        from tests.mlmodel_executor import run_graph

        x = _normalize_np(np.asarray(crop_u8)).transpose(2, 0, 1)[None]
        return run_graph(self._init_layers, {"image_scaled": x})["features"]

    def _interp_step(self, crop_u8, feats, prev_size):
        from tests.mlmodel_executor import run_graph

        x = _normalize_np(np.asarray(crop_u8)).transpose(2, 0, 1)[None]
        out = run_graph(
            self._track_layers, {"image_scaled": x, "template_features": feats}
        )
        cls = jnp.asarray(out["cls"].transpose(0, 2, 3, 1))  # (1,16,16,1)
        reg = jnp.asarray(out["bbox"].transpose(0, 2, 3, 1))  # (1,16,16,4)
        res = self._pp_jit(cls, reg, jnp.asarray(np.asarray(prev_size, np.float32))[None])
        return res.bbox[0], res.confidence[0]


def run_control(max_frames: int, smooth: bool = True):
    from feartracker_tpu.utils.video import read_video

    name = "reference_trajectory_smooth.json" if smooth else "reference_trajectory.json"
    gold = json.load(open(os.path.join(GOLDEN_DIR, name)))
    video = read_video(gold["video"], max_frames=max_frames)

    tracker = InterpreterModelTracker(TrackerConfig(smooth=smooth))
    tracker.initialize(video[0], np.asarray(gold["initial_bbox"], np.float64))
    boxes = []
    for i in range(1, len(video)):
        boxes.append([int(v) for v in tracker.update(video[i])["bbox"]])
    return boxes, gold["boxes"][: len(boxes)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_frames", type=int, default=661)
    ap.add_argument("--no-smooth", action="store_true")
    args = ap.parse_args()

    boxes, gold = run_control(args.max_frames, smooth=not args.no_smooth)
    exact = sum(b == g for b, g in zip(boxes, gold))
    diffs = [
        (i, b, g, max(abs(x - y) for x, y in zip(b, g)))
        for i, (b, g) in enumerate(zip(boxes, gold))
        if b != g
    ]
    print(f"identical-model-outputs control (smooth={not args.no_smooth}):")
    print(f"  {exact}/{len(boxes)} frames bit-exact vs the reference-oracle golden")
    if diffs:
        worst = max(d[3] for d in diffs)
        print(f"  {len(diffs)} divergent frames, max |delta| = {worst} px")
        for i, b, g, d in diffs[:10]:
            print(f"    frame {i+1}: control={b} oracle={g} (|delta|={d})")
    else:
        print("  decode path proven bit-parity: the golden's divergence is")
        print("  model-forward float noise, not the crop/penalty/decode math.")


if __name__ == "__main__":
    main()
