"""Generate a synthetic single-object tracking dataset (train CSV + GOT-10k
style val sequences).

Moving, scaling, color-jittered shapes over textured backgrounds — enough
signal to verify end-to-end that the training stack actually learns to track
(the reference provides no such capability; its smoke path was a config that
subsamples real datasets, config/utility_overrides/local_fast.yaml).

    python tools/make_synthetic_dataset.py --root /tmp/synth --tracks 40 \
        --frames 24 --val_sequences 8
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _textured_background(rng, size, obj_scale=1.0):
    """Texture drawn on the LOGICAL (1×) grid so the rng draw count — and
    hence the whole downstream random stream — is independent of resolution:
    (size·k, obj_scale=k) renders the same scene k× larger."""
    h, w = size
    h0, w0 = int(round(h / obj_scale)), int(round(w / obj_scale))
    base = rng.randint(30, 120, (h0 // 8, w0 // 8, 3)).astype(np.uint8)
    bg = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
    noise = rng.randint(-12, 13, (h0, w0, 3))
    if (h0, w0) != (h, w):
        noise = cv2.resize(noise.astype(np.int16), (w, h), interpolation=cv2.INTER_NEAREST)
    return np.clip(bg.astype(int) + noise, 0, 255).astype(np.uint8)


def _draw_object(img, rng, cx, cy, w, h, color, kind, angle=0.0):
    """Draw a (possibly rotated) shape; returns its axis-aligned xywh bbox."""
    if angle:
        if kind == 1:
            cv2.ellipse(img, (int(cx), int(cy)), (int(w / 2), int(h / 2)),
                        angle, 0, 360, color, -1)
            rad = np.deg2rad(angle)
            ex = np.hypot(w / 2 * np.cos(rad), h / 2 * np.sin(rad))
            ey = np.hypot(w / 2 * np.sin(rad), h / 2 * np.cos(rad))
            x1, y1, x2, y2 = cx - ex, cy - ey, cx + ex, cy + ey
        else:
            if kind == 0:
                pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)), float(angle)))
            else:
                base = np.array([[0.0, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
                rad = np.deg2rad(angle)
                rot = np.array([[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]])
                pts = base @ rot.T + [cx, cy]
            cv2.fillPoly(img, [pts.astype(np.int32)], color)
            x1, y1 = pts.min(axis=0)
            x2, y2 = pts.max(axis=0)
        x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
        return [x1, y1, x2 - x1, y2 - y1]
    x1, y1 = int(cx - w / 2), int(cy - h / 2)
    x2, y2 = int(cx + w / 2), int(cy + h / 2)
    if kind == 0:
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif kind == 1:
        cv2.ellipse(img, (int(cx), int(cy)), (int(w / 2), int(h / 2)), 0, 0, 360, color, -1)
    else:
        pts = np.array([[cx, y1], [x2, y2], [x1, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    return [x1, y1, x2 - x1, y2 - y1]


def generate_track(rng, out_dir, track_id, n_frames, size=(160, 224), distractors=2,
                   appearance_drift=0.0, scenario="drift", obj_scale=1.0,
                   presence_dropout=0.0):
    """``appearance_drift`` ∈ [0, 1]: the object's color linearly morphs to a
    second random color over the track (0 = static appearance + small jitter
    only).

    ``scenario`` selects a structural-appearance-change regime — the events
    the dual-template update exists for (VERDICT r2 #3):

    * ``"drift"``     — color morph only (the original generator);
    * ``"occlusion"`` — two occluder bars sweep across the frame and pass
      over the object around 1/3 and 2/3 of the track (frames where the
      target is mostly hidden; a confidence-gated template update must NOT
      absorb the occluder);
    * ``"pose"``      — out-of-plane pose morph: the shape rotates through
      ~140° over the track with foreshortening (apparent width shrinks to
      35%) and view-dependent shading — by mid-track the appearance is
      structurally unlike the init template;
    * ``"swap"``      — distractor-swap event: a same-color, same-shape
      distractor crosses the target's path at mid-track, drawn ON TOP (it
      momentarily occludes the target) and continues — the classic identity
      -swap trap.

    ``obj_scale`` multiplies every absolute-pixel quantity (object/distractor
    sizes, velocities, occluder sweep) AFTER the rng draws, so
    ``size=(2h, 2w), obj_scale=2`` renders the geometrically identical scene
    at 2× resolution with an unchanged random stream — the letterbox-penalty
    experiment (tools/letterbox_penalty.py).

    ``presence_dropout`` ∈ [0, 1): per-frame probability (frames ≥ 2) that
    the target is NOT rendered — the frame is annotated ``presence=0`` and
    trains the negative/zero-label-map path (ref: siam_dataset.py:49-52;
    the reference's CSVs carry such rows via the ``presence`` column,
    README.md:90). The extra rng draw happens ONLY when the feature is on,
    so every existing fixture's random stream is unchanged at the default 0.
    """
    h, w = size
    bg = _textured_background(rng, size, obj_scale=obj_scale)
    color = tuple(int(c) for c in rng.randint(120, 255, 3))
    color2 = tuple(int(c) for c in rng.randint(60, 255, 3))
    kind = int(rng.randint(3))
    cx, cy = rng.uniform(0.3 * w, 0.7 * w), rng.uniform(0.3 * h, 0.7 * h)
    ow, oh = rng.uniform(24, 48) * obj_scale, rng.uniform(24, 48) * obj_scale
    vx, vy = rng.uniform(-4, 4) * obj_scale, rng.uniform(-3, 3) * obj_scale
    dis = [
        (tuple(int(c) for c in rng.randint(60, 255, 3)), int(rng.randint(3)),
         rng.uniform(0, w), rng.uniform(0, h), rng.uniform(12, 36) * obj_scale,
         rng.uniform(-3, 3) * obj_scale, rng.uniform(-3, 3) * obj_scale)
        for _ in range(distractors)
    ]
    # occluder bars: (width, color, crossing frame) — they sweep left→right
    # timed so the bar center meets the OBJECT center at the crossing frame
    occluders = [
        (rng.uniform(0.8, 1.2), tuple(int(c) for c in rng.randint(40, 220, 3)), n_frames // 3),
        (rng.uniform(0.8, 1.2), tuple(int(c) for c in rng.randint(40, 220, 3)), (2 * n_frames) // 3),
    ]
    rows = []
    for f in range(n_frames):
        img = bg.copy()
        # distractors first (object occludes them)
        for dcolor, dkind, dx, dy, ds, dvx, dvy in dis:
            px = (dx + dvx * f) % w
            py = (dy + dvy * f) % h
            _draw_object(img, rng, px, py, ds, ds, dcolor, dkind)
        scale = 1.0 + 0.25 * np.sin(f / 6.0)
        cxf = np.clip(cx + vx * f, 0.15 * w, 0.85 * w)
        cyf = np.clip(cy + vy * f, 0.15 * h, 0.85 * h)
        t = f / max(n_frames - 1, 1)
        t_drift = appearance_drift * t
        base = tuple((1 - t_drift) * a + t_drift * b for a, b in zip(color, color2))
        angle = 0.0
        w_eff = ow * scale
        if scenario == "pose":
            angle = 140.0 * t
            fore = 0.35 + 0.65 * abs(np.cos(np.deg2rad(angle)))
            w_eff *= fore  # out-of-plane foreshortening
            shade = 0.55 + 0.45 * fore  # view-dependent shading
            base = tuple(c * shade for c in base)
        jitter = tuple(int(np.clip(c + rng.randint(-10, 11), 0, 255)) for c in base)
        absent = bool(presence_dropout) and f >= 2 and rng.rand() < presence_dropout
        if absent:
            # compute the would-be bbox on a scratch canvas; the real frame
            # keeps background + distractors only (a true negative sample)
            bbox = _draw_object(img.copy(), rng, cxf, cyf, w_eff, oh * scale,
                                jitter, kind, angle=angle)
        else:
            bbox = _draw_object(img, rng, cxf, cyf, w_eff, oh * scale, jitter, kind, angle=angle)
        # analytic per-frame visible fraction (cover oracle) — computed from
        # the same geometry that is drawn, with NO extra rng draws, so every
        # committed fixture's random stream is bit-unchanged. Supervises the
        # feature-conditioned update gate (tools/train_feature_gate.py).
        visible = 0.0 if absent else 1.0
        if scenario == "swap":
            # same-appearance distractor crossing the target at mid-track,
            # drawn on top: starts offset, meets the object at n/2, moves on
            mid = n_frames / 2.0
            sx = cxf + (f - mid) * 5.0 * obj_scale
            sy = cyf + (f - mid) * 1.5 * obj_scale
            if 0 <= sx < w and 0 <= sy < h:
                _draw_object(img, rng, sx, sy, ow * scale, oh * scale, jitter, kind)
                if not absent:
                    dw, dh = ow * scale, oh * scale
                    ox = max(0.0, min(bbox[0] + bbox[2], sx + dw / 2) - max(bbox[0], sx - dw / 2))
                    oy = max(0.0, min(bbox[1] + bbox[3], sy + dh / 2) - max(bbox[1], sy - dh / 2))
                    visible *= 1.0 - ox * oy / max(bbox[2] * bbox[3], 1.0)
        if scenario == "occlusion":
            covered = []  # x-intervals of full-height bars over the bbox
            for bw_scale, ocolor, f_cross in occluders:
                bar_w = int(ow * bw_scale)
                # bar sweeps at 6 px/frame; positioned to cover the object
                # center exactly at f_cross
                bx = int(cxf + (f - f_cross) * 6.0 * obj_scale)
                if -bar_w < bx < w + bar_w:
                    cv2.rectangle(img, (bx - bar_w // 2, 0), (bx + bar_w // 2, h), ocolor, -1)
                    lo = max(float(bbox[0]), bx - bar_w // 2)
                    hi = min(float(bbox[0] + bbox[2]), bx + bar_w // 2)
                    if hi > lo:
                        covered.append((lo, hi))
            if not absent and covered:
                covered.sort()
                total, cur_lo, cur_hi = 0.0, *covered[0]
                for lo, hi in covered[1:]:  # union of overlapping intervals
                    if lo > cur_hi:
                        total += cur_hi - cur_lo
                        cur_lo, cur_hi = lo, hi
                    else:
                        cur_hi = max(cur_hi, hi)
                total += cur_hi - cur_lo
                visible *= 1.0 - total / max(float(bbox[2]), 1.0)
        path = f"{track_id}_f{f:04d}.jpg"
        cv2.imwrite(os.path.join(out_dir, path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        near = int(bbox[0] <= 2 or bbox[1] <= 2 or bbox[0] + bbox[2] >= w - 2 or bbox[1] + bbox[3] >= h - 2)
        rows.append(
            dict(
                sequence_id=track_id, track_id=track_id, frame_index=f, img_path=path,
                bbox=str(bbox), frame_shape=str([w, h]), dataset="synthetic",
                presence=0 if absent else 1, near_corner=near,
                visible=round(float(visible), 4),
            )
        )
    return rows


def generate(root, tracks=40, frames=24, val_sequences=8, seed=0, size=(160, 224),
             appearance_drift=0.0, scenario="drift", obj_scale=1.0,
             presence_dropout=0.0):
    """``presence_dropout`` applies to TRAIN tracks only — val sequences are
    scored per-frame against groundtruth and must keep the target visible."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for t in range(tracks):
        rows += generate_track(rng, img_dir, f"track{t:04d}", frames, size=size,
                               appearance_drift=appearance_drift, scenario=scenario,
                               obj_scale=obj_scale, presence_dropout=presence_dropout)
    df = pd.DataFrame(rows)
    df["img_path"] = "images/" + df["img_path"]
    csv_path = os.path.join(root, "train.csv")
    df.to_csv(csv_path, index=False)

    # held-out val sequences in GOT-10k layout
    val_base = os.path.join(root, "got10k", "val")
    os.makedirs(val_base, exist_ok=True)
    names = []
    for s in range(val_sequences):
        seq = f"GOT-10k_Val_{s:06d}"
        seq_dir = os.path.join(val_base, seq)
        os.makedirs(seq_dir, exist_ok=True)
        vrows = generate_track(rng, seq_dir, seq, frames, size=size,
                               appearance_drift=appearance_drift, scenario=scenario,
                               obj_scale=obj_scale)
        gt = []
        for i, r in enumerate(vrows):
            src = os.path.join(seq_dir, r["img_path"])
            dst = os.path.join(seq_dir, f"{i:08d}.jpg")
            os.replace(src, dst)
            gt.append(",".join(map(str, eval(r["bbox"]))))
        with open(os.path.join(seq_dir, "groundtruth.txt"), "w") as fh:
            fh.write("\n".join(gt))
        # GOT-10k-native per-frame cover labels (0..8 visible-ratio bins) from
        # the analytic visibility oracle — the gate-training supervision
        with open(os.path.join(seq_dir, "cover.label"), "w") as fh:
            fh.write("\n".join(str(int(round(r["visible"] * 8))) for r in vrows))
        names.append(seq)
    with open(os.path.join(val_base, "list.txt"), "w") as fh:
        fh.write("\n".join(names))
    return csv_path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--tracks", type=int, default=40)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--val_sequences", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--appearance_drift", type=float, default=0.0,
                   help="0..1: object color morphs to a second color over the track")
    p.add_argument("--scenario", default="drift",
                   choices=["drift", "occlusion", "pose", "swap"],
                   help="structural-appearance-change regime (see generate_track)")
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--obj_scale", type=float, default=1.0,
                   help="multiply object sizes/velocities (pair with size·k "
                   "for a k× resolution render of the same scene)")
    p.add_argument("--presence_dropout", type=float, default=0.0,
                   help="per-frame probability a train frame omits the target "
                   "(presence=0 negative rows; val sequences unaffected)")
    args = p.parse_args()
    csv_path = generate(args.root, args.tracks, args.frames, args.val_sequences, args.seed,
                    size=(args.height, args.width), appearance_drift=args.appearance_drift,
                    scenario=args.scenario, obj_scale=args.obj_scale,
                    presence_dropout=args.presence_dropout)
    print(f"wrote {csv_path} + val sequences under {args.root}/got10k/val")


if __name__ == "__main__":
    main()
