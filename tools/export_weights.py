"""Export FEARNet variables to a self-contained .npz artifact.

The recovered FEAR-XS weights normally come from the reference's CoreML
export at load time; packaging them as an .npz makes the framework fully
standalone (bench/eval/demo run with trained weights even without the
reference checkout). The reference is MIT-licensed (Piñata Farms, 2022), so
redistributing the recovered weights with attribution is permitted.

    python tools/export_weights.py --weights_path .../Tracker.mlmodel \
        --out feartracker_tpu/weights/fear_xs.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_npz(variables, out_path: str) -> None:
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v) for k, v in flatten_dict(variables).items()
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **flat)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights_path",
                    default="/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel")
    ap.add_argument("--out", default="feartracker_tpu/weights/fear_xs.npz")
    ap.add_argument("--adjust_channels", type=int, default=256)
    ap.add_argument("--towernum", type=int, default=2)
    args = ap.parse_args()

    from feartracker_tpu.convert.load import load_variables

    variables = load_variables(
        args.weights_path, channels=args.adjust_channels, towernum=args.towernum
    )
    save_npz(variables, args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 2**20:.1f} MB)")


if __name__ == "__main__":
    main()
