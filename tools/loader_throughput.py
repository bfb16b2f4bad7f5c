"""Measure input-pipeline throughput vs the train step's demand (VERDICT r4 #5).

The reference feeds its GPUs with torch DataLoader worker processes capped
at the batch size (ref: model_training/train/base_lightning_model.py:113-132);
this repo feeds the chip with a GIL-thread pool (`data/loader.py`) on a
1-core host, with `device_augs: true` available to move the hot augmentation
work into the jitted step. This tool measures, for both loader modes:

  * loader-only samples/s (host assembly, no device in the loop), and
  * the measured device step demand (samples/s from BENCHMARKS' train sweep,
    or remeasured live with --step on a real backend),

and prints the feed ratio — the number that says whether training on this
host is host-bound, plus where the crossover sits.

    python tools/loader_throughput.py --root /tmp/synth --batch 32 --steps 24
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# device-side demand measured on the real chip (BENCHMARKS.md train sweep)
MEASURED_STEP_SAMPLES_S = {32: 2227.0, 64: 2798.0, 128: 3515.0, 256: 3213.0}


def dataset_config(root: str, device_augs: bool, num_samples: int,
                   image_cache: bool = False):
    return {
        "device_augs": device_augs,
        "train": {"datasets": [{
            "name": "synthetic", "root": root,
            "device_augs": device_augs,
            "image_cache": image_cache,
            "sizes": {
                "search_image_size": 256, "template_image_size": 128,
                "search_context": 2, "template_bbox_offset": 0.2,
                "search_image_shift": 32, "search_image_scale": 0.2,
                "context_range": 1,
            },
            "regression_weight_label_size": 16,
            "sampling": {
                "type": "track", "data_path": f"{root}/train.csv",
                "negative_ratio": 0, "frame_offset": 8,
                "num_samples": num_samples, "clip_range": True,
            },
        }]},
    }


def measure_loader(root: str, device_augs: bool, batch: int, steps: int,
                   num_workers: int, seed: int = 0, image_cache: bool = False):
    from feartracker_tpu.data.dataset import get_training_datasets
    from feartracker_tpu.data.loader import BatchLoader

    ds = get_training_datasets(
        dataset_config(root, device_augs, num_samples=batch * (steps + 2),
                       image_cache=image_cache),
        seed=seed,
    )
    loader = BatchLoader(ds, batch_size=batch, num_workers=num_workers, seed=seed)

    def one_epoch():
        it = iter(loader)
        next(it)  # warm the pool + page caches before timing
        t0 = time.time()
        n = 0
        for _ in range(steps):
            next(it)
            n += batch
        return n / (time.time() - t0)

    cold = one_epoch()
    if not image_cache:
        return cold, None
    loader.epoch += 1  # fresh permutation; cache is now warm
    return cold, one_epoch()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/synth_loader")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--num_workers", type=int, default=2)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "train.csv")):
        from tools.make_synthetic_dataset import generate

        generate(args.root, tracks=64, frames=16, val_sequences=0, seed=0,
                 size=(288, 384), obj_scale=1.5)

    demand = MEASURED_STEP_SAMPLES_S.get(args.batch)
    for mode, device_augs, cache in (
        ("host_augs", False, False),
        ("device_augs", True, False),
        ("host_augs+cache", False, True),
        ("device_augs+cache", True, True),
    ):
        cold, warm = measure_loader(args.root, device_augs, args.batch,
                                    args.steps, args.num_workers,
                                    image_cache=cache)
        sps = warm if warm is not None else cold
        rec = {
            "mode": mode, "batch": args.batch, "num_workers": args.num_workers,
            "loader_samples_s": round(sps, 1),
            **({"first_epoch_samples_s": round(cold, 1)} if warm is not None else {}),
            "device_step_samples_s": demand,
            "feed_ratio": round(sps / demand, 4) if demand else None,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
