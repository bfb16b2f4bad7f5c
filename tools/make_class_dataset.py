"""Synthetic ImageFolder classification dataset for trunk pretraining.

The reference's tracker quality leans on an ImageNet-pretrained FBNet trunk
(ref: model_training/model/blocks.py:22-25, config/model/fear.yaml:5); no
ImageNet exists in this environment, so this generator provides a
class-structured stand-in for tools/pretrain_trunk.py: each class is a
(shape kind × color family) signature rendered with heavy intra-class
variation — position, scale, rotation, color jitter, textured backgrounds,
distractor shapes — so a trunk must learn shape/color/edge features (the
same low-level features tracking needs) to separate the classes.

Layout: <root>/<class_name>/*.jpg (ImageFolder, what pretrain_trunk expects).

    python tools/make_class_dataset.py --root /tmp/synth_cls \
        --per_class 160 --size 128 --seed 0
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_synthetic_dataset import _draw_object, _textured_background  # noqa: E402

# color families: (name, base RGB); intra-class jitter stays within ±40
FAMILIES = [
    ("red", (210, 60, 60)),
    ("green", (60, 200, 80)),
    ("blue", (70, 90, 220)),
    ("yellow", (220, 210, 70)),
]
SHAPES = [("rect", 0), ("ellipse", 1), ("triangle", 2)]


def generate_classes(root: str, per_class: int = 160, size: int = 128,
                     seed: int = 0, distractors: int = 2) -> list:
    """Write len(FAMILIES)×len(SHAPES) classes; returns the class names."""
    rng = np.random.RandomState(seed)
    names = []
    for fam_name, base in FAMILIES:
        for shape_name, kind in SHAPES:
            cls = f"{fam_name}_{shape_name}"
            cls_dir = os.path.join(root, cls)
            os.makedirs(cls_dir, exist_ok=True)
            names.append(cls)
            for i in range(per_class):
                img = _textured_background(rng, (size, size))
                # distractor shapes in RANDOM colors/kinds — the class signal
                # is the dominant (largest) object only
                for _ in range(distractors):
                    _draw_object(
                        img, rng, rng.uniform(0, size), rng.uniform(0, size),
                        rng.uniform(8, 20), rng.uniform(8, 20),
                        tuple(int(c) for c in rng.randint(40, 255, 3)),
                        int(rng.randint(3)),
                    )
                color = tuple(
                    int(np.clip(c + rng.randint(-40, 41), 0, 255)) for c in base
                )
                w = rng.uniform(0.35, 0.7) * size
                h = w * rng.uniform(0.6, 1.4)
                _draw_object(
                    img, rng,
                    rng.uniform(0.3 * size, 0.7 * size),
                    rng.uniform(0.3 * size, 0.7 * size),
                    w, h, color, kind, angle=float(rng.uniform(0, 180)),
                )
                cv2.imwrite(os.path.join(cls_dir, f"{i:05d}.jpg"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return names


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--per_class", type=int, default=160)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    names = generate_classes(args.root, args.per_class, args.size, args.seed)
    print(f"wrote {len(names)} classes × {args.per_class} images under {args.root}")


if __name__ == "__main__":
    main()
