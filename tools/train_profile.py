"""Training-step batch sweep + roofline on the real chip.

Completes the training half of the performance story (the inference scan
step's roofline lives in tools/roofline.py): for each batch size, time the
full FEAR-XS train step (full 256²/128² geometry, bf16, fused loss + in-graph
metrics + optimizer update), pull XLA's cost model from the compiled step,
and report samples/s plus compute/HBM roofline utilization.

    python tools/train_profile.py --batches 32,64,128,256 --timed 20

Timing is dispatch-pipelined and synced with a host fetch, the same
methodology as bench.py (per-dispatch tunnel latency would otherwise
dominate; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def synthetic_train_batch(rng: np.random.RandomState, B: int, score: int = 16):
    """Full-geometry Siamese batch with plausible label maps (the step's
    cost does not depend on label contents)."""
    from feartracker_tpu.core import box_coder as bc
    from feartracker_tpu.utils import constants as C

    spec = bc.BoxCoderSpec()
    boxes = np.stack(
        [
            rng.uniform(64, 128, B),
            rng.uniform(64, 128, B),
            rng.uniform(32, 96, B),
            rng.uniform(32, 96, B),
        ],
        1,
    ).astype(np.float32)
    import jax.numpy as jnp

    enc = bc.encode(jnp.asarray(boxes), spec)
    return {
        C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: rng.rand(B, 128, 128, 3).astype(np.float32),
        C.TRACKER_TARGET_SEARCH_IMAGE_KEY: rng.rand(B, 256, 256, 3).astype(np.float32),
        C.TRACKER_TARGET_BBOX_KEY: boxes,
        C.TARGET_CLASSIFICATION_KEY: np.asarray(enc.classification_label, np.float32),
        C.TARGET_REGRESSION_LABEL_KEY: np.asarray(enc.regression_map, np.float32),
        C.TARGET_REGRESSION_WEIGHT_KEY: np.asarray(enc.classification_label, np.float32)[..., 0],
        C.TARGET_VISIBILITY_KEY: np.ones((B, 1), np.float32),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--timed", type=int, default=20)
    ap.add_argument("--dual", action="store_true", help="profile the dual-template step")
    ap.add_argument("--scan_steps", type=int, default=1,
                    help="optimizer steps fused per dispatch (make_train_multistep)")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace of 3 steps at the FIRST batch size "
                         "(summarize with tools/parse_trace.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feartracker_tpu.convert.fear_weights import load_fear_xs
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.train.optim import build_optimizer
    from feartracker_tpu.train.step import TrainState, create_train_state, make_train_step
    from feartracker_tpu.utils import constants as C

    model = FEARNet(dtype=jnp.bfloat16)
    tx = build_optimizer({"name": "adam", "lr": 1e-4})
    try:
        variables = load_fear_xs(TRACKER_ML)
        state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 128, 128, 3), (1, 256, 256, 3))
        state0 = TrainState(variables["params"], variables["batch_stats"], tx.init(variables["params"]), state0.step)
        print("[setup] weights: fear_xs", file=sys.stderr)
    except Exception as e:
        print(f"[setup] weights: random ({e!r})", file=sys.stderr)
        state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 128, 128, 3), (1, 256, 256, 3))

    step = make_train_step(model, tx, dual_template=args.dual)
    K = args.scan_steps
    if K > 1:
        from feartracker_tpu.train.step import make_train_multistep

        step = make_train_multistep(step, K)
    rng = np.random.RandomState(0)

    for B in [int(b) for b in args.batches.split(",")]:
        batch = synthetic_train_batch(rng, B)
        if args.dual:
            batch[C.TRACKER_TARGET_AUX_IMAGE_KEY] = rng.rand(B, 128, 128, 3).astype(np.float32)
        if K > 1:  # leading scan axis; same data each step (cost is data-blind)
            batch = {k: np.broadcast_to(v, (K,) + v.shape).copy() for k, v in batch.items()}
        batch = {k: jax.device_put(v) for k, v in batch.items()}

        compiled = step.lower(state0, batch).compile()  # step is already jitted
        ca = compiled.cost_analysis() or {}
        # NOTE: XLA counts a lax.scan body once — with K>1 these are per-STEP
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))

        state = state0
        for _ in range(args.warmup):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])  # sync
        if args.trace:
            from feartracker_tpu.evaluate.profiling import trace

            with trace(args.trace):
                for _ in range(3):
                    state, metrics = step(state, batch)
                np.asarray(metrics["loss"])
            args.trace = None  # first batch size only
        t0 = time.time()
        for _ in range(args.timed):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])  # sync with host fetch
        dt = (time.time() - t0) / args.timed / K  # per optimizer step

        rec = {
            "batch": B,
            "scan_steps": K,
            "step_ms": round(dt * 1e3, 2),
            "samples_per_s": round(B / dt, 1),
            "flops_per_step": flops,
            "hbm_bytes_per_step": bytes_acc,
            "mfu_pct": round(100.0 * flops / dt / V5E_BF16_FLOPS, 1) if flops else None,
            "hbm_util_pct": round(100.0 * bytes_acc / dt / V5E_HBM_BPS, 1) if bytes_acc else None,
            "compute_floor_ms": round(1e3 * flops / V5E_BF16_FLOPS, 2) if flops else None,
            "hbm_floor_ms": round(1e3 * bytes_acc / V5E_HBM_BPS, 2) if bytes_acc else None,
        }
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
