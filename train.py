"""Training entry point — CLI parity with the reference
(ref: model_training/train.py: ``python model_training/train.py backend=2gpu``).

Usage:
    python train.py backend=tpu_dp dataset=got10k_train
    python train.py backend=cpu utility_overrides=local_fast \
        visual_object_tracking_datasets=/data/fear
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    from feartracker_tpu.config.compose import load_config, save_config
    from feartracker_tpu.train.loop import train
    from feartracker_tpu.utils.logging import create_logger

    logger = create_logger("train")
    overrides = [a for a in sys.argv[1:] if "=" in a]
    config = load_config("fear_tracker", overrides=overrides)

    exp = config.get("experiment", {})
    exp_dir = os.path.join(exp.get("folder", "experiments"), exp.get("name", "FEAR"))
    os.makedirs(exp_dir, exist_ok=True)
    save_config(config, os.path.join(exp_dir, "experiment_config.yaml"))
    logger.info("experiment dir: %s", exp_dir)
    train(config)


if __name__ == "__main__":
    main()
