"""Probe: can a whole-map signal separate good template updates from
occluder/distractor absorptions where the decode confidence cannot?

Round-4 measurements (BENCHMARKS.md "Confidence-threshold sweep") bounded the
confidence gate: occluder absorption happens at confidence ≈ 1.0, so no
threshold below 1 rejects it, and a candidate-similarity gate overlaps too
heavily to help. This probe tests the two remaining cheap signals:

* **APCE** (average peak-to-correlation energy, LMCF CVPR'17), now emitted
  per frame by the scan runtime (``outputs["apce"]``): whole-map peak
  sharpness — a second mode (target + occluder both responding) or a flat
  map drops it even when the argmax cell saturates.
* **Stability** (consecutive confident frames), computed post hoc from the
  confidence trace: the round-4 probe showed occlusion confidence is bimodal
  with sub-0.31 dips — requiring M consecutive frames above the gate before
  an update would block refreshes during the occlusion episode.

Per scenario × seed it tracks the val sequences with the *harmful* config
(ema@1, threshold 0.85), labels every update-eligible frame good/bad by
GT overlap of the predicted box, and reports the separability of each
signal: distribution quantiles per class plus, for a sweep of thresholds,
how many bad updates each gate blocks vs good updates it sacrifices.

    python tools/occlusion_signal_probe.py --scenarios occlusion,pose,swap \
        --seeds 7,13 --frames 48
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quantiles(xs, qs=(0.05, 0.25, 0.5, 0.75, 0.95)):
    import numpy as np

    if not len(xs):
        return None
    return {f"q{int(q * 100)}": round(float(np.quantile(xs, q)), 2) for q in qs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default="occlusion,pose,swap")
    ap.add_argument("--seeds", default="7,13")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--sequences", type=int, default=8)
    ap.add_argument("--update_threshold", type=float, default=0.85)
    ap.add_argument("--good_iou", type=float, default=0.3,
                    help="GT overlap above which an eligible frame counts as "
                    "a good update candidate")
    ap.add_argument("--apce_grid", default="10,15,20,25,30,40")
    ap.add_argument("--stab_grid", default="2,3,4,6")
    ap.add_argument("--root", default=None)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu; sitecustomize "
                    "ignores JAX_PLATFORMS, so this sets jax.config)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tools.make_synthetic_dataset import generate

    from feartracker_tpu.core.geometry import overlap_xywh_np
    from feartracker_tpu.data.dataset import read_img
    from feartracker_tpu.data.sequence import GOT10kDataset
    from feartracker_tpu.evaluate.harness import build_scan_tracker

    work = args.root or tempfile.mkdtemp(prefix="occl_probe_")
    seeds = [int(s) for s in args.seeds.split(",")]
    scenarios = args.scenarios.split(",")
    apce_grid = [float(t) for t in args.apce_grid.split(",")]
    stab_grid = [int(t) for t in args.stab_grid.split(",")]

    tracker, prov = build_scan_tracker(
        dynamic_template=True, update_mode="ema",
        update_threshold=args.update_threshold, update_rate=0.2,
        update_interval=1,
    )
    print(json.dumps({"weights": prov, "config": "ema@1",
                      "threshold": args.update_threshold}), flush=True)

    # pooled per-class signal values across the whole probe
    pooled = {"good": {"apce": [], "conf": [], "stab": []},
              "bad": {"apce": [], "conf": [], "stab": []}}

    for scenario in scenarios:
        for seed in seeds:
            root = os.path.join(work, f"{scenario}_s{seed}")
            if not os.path.isdir(os.path.join(root, "got10k")):
                generate(root, tracks=1, frames=args.frames,
                         val_sequences=args.sequences, seed=seed,
                         appearance_drift=0.0, scenario=scenario)
            ds = GOT10kDataset(os.path.join(root, "got10k"), subset="val")

            # all sequences share the generator's frame size -> batch as streams
            seqs = [ds[i] for i in range(len(ds))]
            T = min(len(f) for f, _, _ in seqs)
            frames = np.stack(
                [np.stack([read_img(f[t]) for f, _, _ in seqs]) for t in range(T)]
            )  # (T, S, H, W, 3)
            gt = np.stack([a[:T] for _, a, _ in seqs], axis=1)  # (T, S, 4)

            state = tracker.init(frames[0], gt[0].astype(np.float32))
            state, out = tracker.track(state, frames[1:])
            bbox = np.asarray(out["bbox"])          # (T-1, S, 4)
            conf = np.asarray(out["confidence"])    # (T-1, S)
            apce = np.asarray(out["apce"])          # (T-1, S)

            iou = np.stack([
                overlap_xywh_np(bbox[t], gt[t + 1]) for t in range(T - 1)
            ])  # (T-1, S)

            # stability counter BEFORE frame t's update decision: number of
            # consecutive already-seen frames (t-1, t-2, ...) above the gate
            above = conf > args.update_threshold
            stab = np.zeros_like(conf, dtype=np.int32)
            run = np.zeros(conf.shape[1], dtype=np.int32)
            for t in range(conf.shape[0]):
                stab[t] = run
                run = np.where(above[t], run + 1, 0)

            eligible = above  # frames where the confidence gate fires
            good = eligible & (iou >= args.good_iou)
            bad = eligible & (iou < args.good_iou)
            for cls, mask in (("good", good), ("bad", bad)):
                pooled[cls]["apce"] += apce[mask].tolist()
                pooled[cls]["conf"] += conf[mask].tolist()
                pooled[cls]["stab"] += stab[mask].tolist()

            print(json.dumps({
                "scenario": scenario, "seed": seed,
                "eligible": int(eligible.sum()),
                "good": int(good.sum()), "bad": int(bad.sum()),
                "apce_good": quantiles(apce[good]),
                "apce_bad": quantiles(apce[bad]),
                "stab_good": quantiles(stab[good]),
                "stab_bad": quantiles(stab[bad]),
            }), flush=True)

    print("\n== pooled separability (update-eligible frames only) ==")
    ng, nb = len(pooled["good"]["apce"]), len(pooled["bad"]["apce"])
    print(json.dumps({"n_good": ng, "n_bad": nb,
                      "apce_good": quantiles(pooled["good"]["apce"]),
                      "apce_bad": quantiles(pooled["bad"]["apce"])}), flush=True)
    ga = np.asarray(pooled["good"]["apce"])
    ba = np.asarray(pooled["bad"]["apce"])
    gs = np.asarray(pooled["good"]["stab"])
    bs = np.asarray(pooled["bad"]["stab"])
    for thr in apce_grid:
        print(json.dumps({
            "gate": f"apce>{thr:g}",
            "bad_blocked": f"{int((ba <= thr).sum())}/{nb}",
            "good_sacrificed": f"{int((ga <= thr).sum())}/{ng}",
        }), flush=True)
    for m in stab_grid:
        print(json.dumps({
            "gate": f"stab>={m}",
            "bad_blocked": f"{int((bs < m).sum())}/{nb}",
            "good_sacrificed": f"{int((gs < m).sum())}/{ng}",
        }), flush=True)


if __name__ == "__main__":
    main()
