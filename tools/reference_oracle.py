"""Run the REFERENCE's own tracker host code to produce an oracle trajectory.

This executes /root/reference/model_training/tracker/{base_tracker,fear_tracker}.py
verbatim (loaded via importlib — never copied), with:

* the net served by tests/mlmodel_executor.run_graph over the parsed CoreML
  graphs (TrackerInit.mlmodel / Tracker.mlmodel) — the same weights the repo's
  Flax model carries;
* a minimal, faithful shim for ``albumentations`` (only Normalize / Resize /
  Compose, exactly the semantics base_tracker.py:69-81 and utils.py:233-252
  rely on), since albumentations is not installed here.

The emitted JSON (tests/golden/reference_trajectory*.json) is the parity
oracle for tests/test_reference_parity.py: the reference tracker's bbox
trajectory on assets/test.mp4, per frame, produced by reference code — not by
this repo.

Usage:
  python tools/reference_oracle.py --max_frames 661 \
      --out tests/golden/reference_trajectory.json [--smooth]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import types

import cv2
import numpy as np
import torch

REF = "/root/reference"
TRACKER_ML = f"{REF}/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
INIT_ML = f"{REF}/evaluate/FEARDemo/FEARDemo/TrackerInit.mlmodel"
VIDEO = f"{REF}/assets/test.mp4"
DEFAULT_BBOX = [163, 53, 45, 174]  # demo_video.py default initial_bbox

# config/tracker/siam_tracker.yaml, minus hydra _target_/interp keys
TRACKING_CONFIG = dict(
    penalty_k=0.062,
    window_influence=0.38,
    lr=0.765,
    windowing="cosine",
    total_stride=16,
    score_size=16,
    ratio=0.94,
    bbox_ratio=0.5,
    template_bbox_offset=0.2,
    search_context=2,
    instance_size=256,
    template_size=128,
)


# --------------------------------------------------------------------------
# albumentations shim — only what the reference tracker path touches
# --------------------------------------------------------------------------


class _Normalize:
    """albumentations.Normalize: (img - mean*max_pix) / (std*max_pix)."""

    def __init__(self, mean, std, max_pixel_value=255.0):
        self.mean = np.asarray(mean, np.float32) * max_pixel_value
        self.std = np.asarray(std, np.float32) * max_pixel_value

    def apply_image(self, img):
        return (img.astype(np.float32) - self.mean) / self.std

    def apply_bboxes(self, bboxes, in_shape):
        return bboxes


class _Resize:
    """albumentations.Resize: cv2 INTER_LINEAR; coco bboxes scale linearly."""

    def __init__(self, height, width):
        self.height, self.width = int(height), int(width)

    def apply_image(self, img):
        return cv2.resize(img, (self.width, self.height), interpolation=cv2.INTER_LINEAR)

    def apply_bboxes(self, bboxes, in_shape):
        h, w = in_shape[:2]
        sx, sy = self.width / w, self.height / h
        return [np.array([b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]) for b in bboxes]


class _Compose:
    def __init__(self, transforms, bbox_params=None):
        self.transforms = transforms

    def __call__(self, image=None, bboxes=None, category_id=None, **kw):
        out = {"image": image}
        if bboxes is not None:
            out["bboxes"] = list(bboxes)
        for t in self.transforms:
            if "bboxes" in out:
                out["bboxes"] = t.apply_bboxes(out["bboxes"], out["image"].shape)
            out["image"] = t.apply_image(out["image"])
        return out


def _install_albumentations_shim():
    mod = types.ModuleType("albumentations")
    mod.Compose = _Compose
    mod.Normalize = _Normalize
    mod.Resize = _Resize
    sys.modules.setdefault("albumentations", mod)


# --------------------------------------------------------------------------
# load the reference tracker modules without their package __init__ imports
# (model_training.utils.__init__ needs hydra; dataset.__init__ needs got10k)
# --------------------------------------------------------------------------


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_tracker_module():
    _install_albumentations_shim()
    for pkg_name, rel in [
        ("model_training", ""),
        ("model_training.utils", "utils"),
        ("model_training.dataset", "dataset"),
        ("model_training.tracker", "tracker"),
    ]:
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [f"{REF}/model_training/{rel}".rstrip("/")]
            sys.modules[pkg_name] = pkg
    _load("model_training.utils.utils", f"{REF}/model_training/utils/utils.py")
    _load("model_training.utils.constants", f"{REF}/model_training/utils/constants.py")
    _load("model_training.dataset.box_coder", f"{REF}/model_training/dataset/box_coder.py")
    base = _load("model_training.tracker.base_tracker", f"{REF}/model_training/tracker/base_tracker.py")
    sys.modules["model_training.tracker"].Tracker = base.Tracker
    return _load("model_training.tracker.fear_tracker", f"{REF}/model_training/tracker/fear_tracker.py")


# --------------------------------------------------------------------------
# serve the net from the CoreML graphs (torch interpreter, test oracle)
# --------------------------------------------------------------------------


class MLModelNet:
    """Duck-typed FEARNet for the reference Tracker: get_features / track.

    Inputs arrive already ImageNet-normalized (base_tracker._preprocess_image),
    so the graphs' own 'scale_layer' preprocessing stage is skipped — the same
    convention as tests/test_model_parity.py.
    """

    def __init__(self):
        from feartracker_tpu.convert.coreml import parse_mlmodel

        self.init_layers = [l for l in parse_mlmodel(INIT_ML)["layers"] if l.name != "scale_layer"]
        self.track_layers = [l for l in parse_mlmodel(TRACKER_ML)["layers"] if l.name != "scale_layer"]

    def get_features(self, img: torch.Tensor) -> torch.Tensor:
        sys.path.insert(0, "/root/repo")
        from tests.mlmodel_executor import run_graph

        out = run_graph(self.init_layers, {"image_scaled": img.numpy()})
        return torch.from_numpy(out["features"])

    def track(self, search: torch.Tensor, feats: torch.Tensor):
        from tests.mlmodel_executor import run_graph

        from model_training.utils.constants import (  # loaded by load_reference_tracker_module
            TARGET_CLASSIFICATION_KEY,
            TARGET_REGRESSION_LABEL_KEY,
        )

        out = run_graph(
            self.track_layers,
            {"image_scaled": search.numpy(), "template_features": feats.numpy()},
        )
        return {
            TARGET_REGRESSION_LABEL_KEY: torch.from_numpy(out["bbox"]),
            TARGET_CLASSIFICATION_KEY: torch.from_numpy(out["cls"]),
        }


# Second parity footage (VERDICT r4 #6): a synthetic pose-morph sequence with
# motion/scale statistics unlike assets/test.mp4 (out-of-plane rotation,
# foreshortening, shading, distractors). Rendered deterministically from
# committed code + this spec, so the test regenerates identical pixels
# instead of committing frames.
SYNTH_SPEC = dict(
    scenario="pose", appearance_drift=0.5, seed=21, size=(240, 320),
    obj_scale=1.2, n_frames=120,
)


def synthetic_video(spec=None):
    """(frames list RGB uint8, initial gt bbox) for the second parity clip."""
    import tempfile

    sys.path.insert(0, "/root/repo")
    from tools.make_synthetic_dataset import generate_track

    from feartracker_tpu.data.dataset import read_img

    spec = dict(SYNTH_SPEC if spec is None else spec)
    rng = np.random.RandomState(spec.pop("seed"))
    n_frames = spec.pop("n_frames")
    out_dir = tempfile.mkdtemp(prefix="parity_clip_")
    rows = generate_track(rng, out_dir, "parity", n_frames, **spec)
    frames = [read_img(f"{out_dir}/{r['img_path']}") for r in rows]
    import ast

    return frames, [int(v) for v in ast.literal_eval(str(rows[0]["bbox"]))]


def run_oracle(max_frames: int, smooth: bool, bbox=DEFAULT_BBOX, footage="assets"):
    sys.path.insert(0, "/root/repo")
    from feartracker_tpu.utils.video import read_video

    fear_mod = load_reference_tracker_module()
    config = dict(TRACKING_CONFIG)
    if smooth:
        config["smooth"] = True
    tracker = fear_mod.FEARTracker(MLModelNet(), cuda_id="cpu", **config)

    if footage == "synthetic":
        video, bbox = synthetic_video()
        video = video[:max_frames]
    else:
        video = read_video(VIDEO, max_frames=max_frames)
    tracker.initialize(video[0], np.array(bbox))
    boxes = []
    for i in range(1, len(video)):
        boxes.append([int(v) for v in tracker.update(video[i])["bbox"]])
    return boxes, bbox


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_frames", type=int, default=661)
    ap.add_argument("--smooth", action="store_true")
    ap.add_argument("--footage", default="assets", choices=["assets", "synthetic"],
                    help="'synthetic' = the deterministic second parity clip "
                    "(SYNTH_SPEC pose-morph scene)")
    ap.add_argument("--out", default="tests/golden/reference_trajectory.json")
    args = ap.parse_args()

    boxes, init_bbox = run_oracle(args.max_frames, args.smooth, footage=args.footage)
    payload = {
        "video": VIDEO if args.footage == "assets" else "synthetic",
        "initial_bbox": init_bbox,
        "smooth": args.smooth,
        "n_updates": len(boxes),
        "producer": "reference model_training.tracker.FEARTracker (importlib) "
        "+ CoreML-graph torch interpreter",
        "boxes": boxes,
    }
    if args.footage == "synthetic":
        payload["synth_spec"] = SYNTH_SPEC
    with open(args.out, "w") as f:
        json.dump(payload, f)
    print(f"wrote {args.out}: {len(boxes)} boxes, first={boxes[0]}, last={boxes[-1]}")


if __name__ == "__main__":
    main()
