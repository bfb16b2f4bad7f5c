"""Train the dual-template interpolation gate on structural-appearance data
(VERDICT r3 #1).

Every recovered FEAR-XS checkpoint zero-fills ``template_gate``
(convert/fear_weights.py — the CoreML exports predate the reference's
unreleased Dynamic Template Update module, ref README.md:96, hook
blocks.py:174-181), so ``update_mode='gated'`` inference has so far run at
the untrained sigmoid(0)=0.5 blend. This tool learns the gate END-TO-END on
the synthetic structural suite (swap/occlusion/pose content —
tools/make_synthetic_dataset.py) while keeping every other weight FROZEN at
the recovered values: the result is exactly "FEAR-XS + trained gate", the
artifact `tools/dual_template_ablation.py --weights_path` needs for an
unconfounded trained-vs-untrained-gate comparison.

Training objective: the dual-template training forward
(models/fear_net.forward_dual — cls branch correlates against
(1-g)·static + g·aux template) with the production FEAR loss, BN in
inference mode (the recovered stats are folded-identity; the gate must be
optimal for the inference-time graph, not a train-BN variant). The single
scalar is optimized with Adam; everything else rides as frozen constants.

    python tools/train_template_gate.py --out feartracker_tpu/weights/fear_xs_gate.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = {
    "search_image_size": 256, "template_image_size": 128,
    "search_context": 2, "template_bbox_offset": 0.2,
    "search_image_shift": 32, "search_image_scale": 0.2,
    "context_range": 1,
}
TRACKER = {
    "score_size": 16, "total_stride": 16, "instance_size": 256,
    "template_size": 128, "template_bbox_offset": 0.2, "search_context": 2,
}


def build_dataset(roots, num_samples, seed):
    from feartracker_tpu.data.dataset import get_training_datasets

    config = {
        "tracker": TRACKER,
        "train": {"datasets": [
            {
                "name": f"synthetic_{os.path.basename(root)}",
                "root": root,
                "dynamic_template": True,
                "sizes": dict(SIZES),
                "regression_weight_label_size": 16,
                "sampling": {
                    "type": "track", "data_path": f"{root}/train.csv",
                    "negative_ratio": 0, "frame_offset": 8,
                    "num_samples": num_samples, "clip_range": True,
                },
            }
            for root in roots
        ]},
    }
    return get_training_datasets(config, seed=seed)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenarios", default="swap,occlusion,pose")
    ap.add_argument("--tracks", type=int, default=12)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--samples_per_scenario", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_seed", type=int, default=101,
                    help="generator seed for the TRAINING scenarios (keep "
                    "disjoint from the ablation's eval seeds)")
    ap.add_argument("--platform", default="", help='"" = default backend (TPU); "cpu" for smoke')
    ap.add_argument("--weights", default="fear_xs")
    ap.add_argument("--out", default="feartracker_tpu/weights/fear_xs_gate.npz")
    ap.add_argument("--work", default=None, help="dataset dir (default: temp)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax

    from tools.export_weights import save_npz
    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.data.loader import BatchLoader
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.train.loss import fear_loss
    from feartracker_tpu.utils import constants as C

    work = args.work or tempfile.mkdtemp(prefix="gate_train_")
    roots = []
    for scenario in args.scenarios.split(","):
        root = os.path.join(work, scenario)
        if not os.path.exists(os.path.join(root, "train.csv")):
            print(f"[gate] generating {scenario} training set -> {root}", flush=True)
            generate(root, tracks=args.tracks, frames=args.frames,
                     val_sequences=0, seed=args.data_seed, scenario=scenario)
        roots.append(root)

    dataset = build_dataset(roots, args.samples_per_scenario, args.seed)
    loader = BatchLoader(dataset, args.batch, shuffle=True, num_workers=2, seed=args.seed)

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = FEARNet(dtype=dtype)
    variables = load_variables(args.weights)
    params = jax.device_put(variables["params"])
    stats = jax.device_put(variables["batch_stats"])

    tx = optax.adam(args.lr)

    def loss_fn(gate, batch):
        p = {**params, "template_gate": gate}
        out = model.apply(
            {"params": p, "batch_stats": stats},
            (
                batch[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY],
                batch[C.TRACKER_TARGET_SEARCH_IMAGE_KEY],
                batch[C.TRACKER_TARGET_AUX_IMAGE_KEY],
            ),
            train=False,  # inference-mode BN: the gate serves the scan runtime
            method=model.forward_dual,
        )
        losses = fear_loss(out, batch)
        return (
            losses[C.TARGET_CLASSIFICATION_KEY] + losses[C.TARGET_REGRESSION_LABEL_KEY],
            losses,
        )

    @jax.jit
    def step(gate, opt_state, batch):
        (total, losses), grad = jax.value_and_grad(loss_fn, has_aux=True)(gate, batch)
        updates, opt_state = tx.update(grad, opt_state, gate)
        return optax.apply_updates(gate, updates), opt_state, total, losses, grad

    device_keys = (
        C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY, C.TRACKER_TARGET_SEARCH_IMAGE_KEY,
        C.TRACKER_TARGET_AUX_IMAGE_KEY, C.TARGET_CLASSIFICATION_KEY,
        C.TARGET_REGRESSION_LABEL_KEY, C.TARGET_REGRESSION_WEIGHT_KEY,
    )
    gate = jnp.asarray(params["template_gate"], jnp.float32)
    opt_state = tx.init(gate)
    t0 = time.time()
    it = 0
    history = []
    for epoch in range(args.epochs):
        loader.epoch = epoch
        dataset.resample()
        for batch in loader:
            device_batch = {k: jnp.asarray(batch[k]) for k in device_keys}
            gate, opt_state, total, losses, grad = step(gate, opt_state, device_batch)
            it += 1
            if it % 8 == 0:
                g = float(jax.nn.sigmoid(gate)[0])
                print(
                    f"[gate] ep {epoch} it {it}: loss {float(total):.4f} "
                    f"cls {float(losses[C.TARGET_CLASSIFICATION_KEY]):.4f} "
                    f"gate logit {float(gate[0]):+.4f} sigmoid {g:.4f} "
                    f"grad {float(grad[0]):+.2e}", flush=True)
        history.append({
            "epoch": epoch, "loss": round(float(total), 4),
            "gate_logit": round(float(gate[0]), 4),
            "gate_sigmoid": round(float(jax.nn.sigmoid(gate)[0]), 4),
        })

    final = {
        "gate_logit": float(gate[0]),
        "gate_sigmoid": float(jax.nn.sigmoid(gate)[0]),
        "steps": it,
        "wall_s": round(time.time() - t0, 1),
        "scenarios": args.scenarios,
        "weights": args.weights,
        "history": history,
    }
    print(json.dumps({k: v for k, v in final.items() if k != "history"}))

    variables = {
        "params": {**variables["params"], "template_gate": np.asarray(gate, np.float32)},
        "batch_stats": variables["batch_stats"],
    }
    save_npz(variables, args.out)
    with open(os.path.splitext(args.out)[0] + ".json", "w") as fh:
        json.dump(final, fh, indent=1)
    print(f"[gate] wrote {args.out} (+ .json training record)")


if __name__ == "__main__":
    main()
