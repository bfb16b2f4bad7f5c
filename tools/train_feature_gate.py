"""Gate v2: train the feature-conditioned dual-template update gate
(VERDICT r4 #4).

The scalar ``template_gate`` trained to sigmoid=0.866 and then measured ≡ the
untrained blend and ≡ plain EMA, and all four scalar-signal gates measured as
negatives (confidence / APCE / candidate-similarity / bbox-stability —
BENCHMARKS.md). This is the multi-feature design those negatives motivate: a
tiny MLP over the per-frame observable VECTOR (models/gate.py) sets the
per-stream EMA rate each frame.

Supervision comes from an analytic oracle the synthetic generator now emits
(cover.label, the GOT-10k-native visible-ratio bins, computed from the drawn
occluder/distractor geometry with no rng changes): a frame's template
candidate is SAFE to blend iff the target is actually visible there and the
predicted box is on it,

    label_t = [visible_t >= vis_thresh] AND [IoU(pred_t, gt_t) >= iou_thresh].

Collection rolls the production EMA@1 tracker (deployment-like trajectory
distribution) over mixed swap/pose/occlusion/drift rollouts on TRAIN seeds
disjoint from the pre-registered eval seeds (7,13,21,29,37), captures the
runtime's emitted ``gate_obs``, trains the MLP with class-balanced BCE on
host, and reports held-out AUC/accuracy.

    python tools/train_feature_gate.py --platform cpu \
        --out feartracker_tpu/weights/fear_xs_feature_gate.npz
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

SCENARIOS = ("swap", "pose", "occlusion", "drift")


def collect_rollouts(scenarios, seeds, frames, sequences, drift, work, chunk=16):
    """Roll the production EMA@1 tracker; return (obs (N,6), vis (N,), iou (N,),
    scenario tag (N,) int). One tracker instance serves every dataset (one
    compile)."""
    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.core.geometry import overlap_xywh_np
    from feartracker_tpu.data.dataset import read_img
    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    tracker, prov = build_scan_tracker(
        dynamic_template=True, update_mode="ema", update_threshold=0.85,
        update_rate=0.2, update_interval=1, postprocess_impl="xla",
    )
    all_obs, all_vis, all_iou, all_tag = [], [], [], []
    for s_i, scenario in enumerate(scenarios):
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}")
            if not os.path.isdir(os.path.join(root, "got10k")):
                generate(root, tracks=1, frames=frames, val_sequences=sequences,
                         seed=seed,
                         appearance_drift=drift if scenario == "drift" else 0.0,
                         scenario=scenario)
            ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")
            seqs = [ds[i] for i in range(len(ds))]
            covers = []
            for i in range(len(ds)):
                seq_dir = os.path.dirname(seqs[i][0][0])
                with open(os.path.join(seq_dir, "cover.label")) as fh:
                    covers.append(np.array([int(x) for x in fh.read().split()]) / 8.0)
            T = min(len(f) for f, _, _ in seqs)
            S = len(seqs)
            frames0 = np.stack([read_img(seqs[i][0][0]) for i in range(S)])
            bb0 = np.stack([np.asarray(seqs[i][1][0], np.float32) for i in range(S)])
            state = tracker.init(frames0, bb0)
            t = 1
            while t < T:
                n = min(chunk, T - t)
                batch = np.stack([
                    np.stack([read_img(seqs[i][0][t + k]) for i in range(S)])
                    for k in range(n)
                ])
                state, out = tracker.track(state, batch, start_step=t - 1)
                obs = np.asarray(out["gate_obs"])  # (n, S, N_OBS)
                pred = np.asarray(out["bbox"], np.float64)  # (n, S, 4)
                for k in range(n):
                    gt = np.stack([np.asarray(seqs[i][1][t + k], np.float64)
                                   for i in range(S)])
                    iou = overlap_xywh_np(pred[k], gt)
                    vis = np.array([covers[i][t + k] for i in range(S)])
                    all_obs.append(obs[k])
                    all_vis.append(vis)
                    all_iou.append(iou)
                    all_tag.append(np.full(S, s_i))
                t += n
    return (np.concatenate(all_obs).astype(np.float32), np.concatenate(all_vis),
            np.concatenate(all_iou), np.concatenate(all_tag), prov)


def train_mlp(obs, labels, hidden, epochs, lr, seed, holdout=0.2):
    """Class-balanced BCE on host (the gate is ~65 params; optax + CPU jit)."""
    import jax
    import jax.numpy as jnp
    import optax

    from feartracker_tpu.models.gate import gate_logit, init_gate_params

    rng = np.random.RandomState(seed)
    n = len(obs)
    perm = rng.permutation(n)
    n_hold = int(n * holdout)
    hold, tr = perm[:n_hold], perm[n_hold:]
    x_tr, y_tr = jnp.asarray(obs[tr]), jnp.asarray(labels[tr].astype(np.float32))
    pos = float(labels[tr].mean())
    w_pos, w_neg = 0.5 / max(pos, 1e-6), 0.5 / max(1 - pos, 1e-6)

    params = jax.tree.map(jnp.asarray, init_gate_params(rng, hidden))
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            logit = gate_logit(p, x)
            ce = optax.sigmoid_binary_cross_entropy(logit, y)
            w = y * w_pos + (1 - y) * w_neg
            return jnp.mean(w * ce)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for epoch in range(epochs):
        params, opt, loss = step(params, opt, x_tr, y_tr)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)

    def scores(idx):
        from feartracker_tpu.models.gate import gate_rate

        return np.asarray(gate_rate(params, jnp.asarray(obs[idx])))

    def auc(y, s):
        order = np.argsort(s)
        ranks = np.empty(len(s)); ranks[order] = np.arange(1, len(s) + 1)
        n_pos, n_neg = int(y.sum()), int((1 - y).sum())
        if n_pos == 0 or n_neg == 0:
            return float("nan")
        return (ranks[y > 0].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    report = {}
    for name, idx in (("train", tr), ("holdout", hold)):
        s, y = scores(idx), labels[idx]
        report[name] = {
            "n": int(len(idx)), "pos_rate": round(float(y.mean()), 4),
            "auc": round(auc(y, s), 4),
            "acc@0.5": round(float(((s > 0.5) == (y > 0.5)).mean()), 4),
            "mean_rate_pos": round(float(s[y > 0.5].mean()), 4) if y.max() > 0 else None,
            "mean_rate_neg": round(float(s[y < 0.5].mean()), 4) if y.min() < 1 else None,
        }
    return params, report, float(loss)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="feartracker_tpu/weights/fear_xs_feature_gate.npz")
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--train_seeds", default="51,52,53,54",
                    help="generator seeds — MUST stay disjoint from the "
                    "pre-registered eval seeds 7,13,21,29,37")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--drift", type=float, default=1.0)
    ap.add_argument("--vis_thresh", type=float, default=0.7)
    ap.add_argument("--iou_thresh", type=float, default=0.5)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dump_obs", default=None, help="also save the raw "
                    "(obs, vis, iou, tag) matrices as npz for analysis")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    eval_seeds = {7, 13, 21, 29, 37}
    train_seeds = [int(s) for s in args.train_seeds.split(",")]
    overlap = eval_seeds & set(train_seeds)
    if overlap:
        raise SystemExit(f"train seeds {overlap} collide with the "
                         "pre-registered eval seeds — pick others")

    t0 = time.time()
    work = args.root or tempfile.mkdtemp(prefix="gate_v2_")
    obs, vis, iou, tag, prov = collect_rollouts(
        args.scenarios.split(","), train_seeds, args.frames, args.sequences,
        args.drift, work)
    labels = ((vis >= args.vis_thresh) & (iou >= args.iou_thresh)).astype(np.float32)
    print(json.dumps({
        "collected": int(len(obs)), "weights": prov,
        "pos_rate": round(float(labels.mean()), 4),
        "collect_s": round(time.time() - t0, 1),
        "per_scenario_pos": {
            s: round(float(labels[tag == i].mean()), 4)
            for i, s in enumerate(args.scenarios.split(","))
        },
    }), flush=True)
    if args.dump_obs:
        np.savez(args.dump_obs, obs=obs, vis=vis, iou=iou, tag=tag, labels=labels)

    params, report, final_loss = train_mlp(
        obs, labels, args.hidden, args.epochs, args.lr, args.seed)
    from feartracker_tpu.models.gate import save_gate

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_gate(params, args.out)
    print(json.dumps({"gate": args.out, "final_loss": round(final_loss, 4),
                      **report, "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
