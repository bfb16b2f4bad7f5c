"""Track object(s) through a video — CLI parity with the reference demo
(ref: demo_video.py: ``python demo_video.py --initial_bbox=... --video_path=...``),
plus multi-object: pass N×4 ints to track N objects through the same footage
(one ScanTracker stream per object, frames shared in-graph — a capability the
single-object reference does not have).

Weights: the reference's CoreML export (default), a Lightning .ckpt, or an
Orbax training checkpoint directory from this framework.

Usage:
    python demo_video.py --initial_bbox 163 53 45 174 \
        --video_path /root/reference/assets/test.mp4 --output_path outputs/test.mp4
    # two objects:
    python demo_video.py --initial_bbox 163 53 45 174 40 60 50 80 ...
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from feartracker_tpu.convert.load import default_weights_path

# reference export when mounted; else the packaged bit-identical archive
DEFAULT_WEIGHTS = default_weights_path()


def get_tracker(weights_path: str, smooth: bool = False, platform: str = "",
                recover_context: float = 0.0, model_name: str = "fear_xs"):
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.models.fear_net import build_family_model
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.tracker import FEARTracker

    model = build_family_model(model_name)
    variables = load_variables(weights_path)
    return FEARTracker(model, variables, TrackerConfig(smooth=smooth),
                       recover_context=recover_context)


def track(tracker, frames, initial_bbox: np.ndarray) -> List[np.ndarray]:
    """(ref: demo_video.py:22-28)"""
    tracked = [np.asarray(initial_bbox)]
    tracker.initialize(frames[0], initial_bbox)
    for frame in frames[1:]:
        tracked.append(np.asarray(tracker.update(frame)["bbox"]))
    return tracked


def track_scan(weights_path, frames, initial_bboxes, smooth=False, dynamic_template=False,
               update_interval=1, chunk=32, recover_context=0.0,
               model_name="fear_xs"):
    """One video, N objects, through the on-device scan runtime.

    ``initial_bboxes``: (N, 4) — one stream per object, the video shared by
    all of them in-graph (one host→device transfer per chunk regardless of N;
    ScanTracker multi-object mode). Returns a list of (N, 4) boxes per frame.
    """
    from feartracker_tpu.convert.load import load_variables
    from feartracker_tpu.models.fear_net import build_family_model
    from feartracker_tpu.tracker.config import TrackerConfig
    from feartracker_tpu.tracker.runtime import ScanTracker

    single = np.asarray(initial_bboxes).ndim == 1
    boxes = np.atleast_2d(np.asarray(initial_bboxes, np.float32))
    model = build_family_model(model_name)
    tracker = ScanTracker(
        model, load_variables(weights_path), TrackerConfig(smooth=smooth),
        dynamic_template=dynamic_template,
        update_interval=update_interval,
        recover_context=recover_context,
    )
    state = tracker.init(frames[0], boxes)
    tracked = [boxes[0] if single else boxes]
    for t0 in range(1, len(frames), chunk):
        state, out = tracker.track(state, frames[t0 : t0 + chunk], start_step=t0 - 1)
        bb = np.asarray(out["bbox"])
        tracked.extend(bb[:, 0] if single else bb)
    return tracked


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--initial_bbox", type=int, nargs="+", default=[163, 53, 45, 174],
                   help="x y w h — or N×4 ints to track N objects in the same "
                   "video (multi-object runs on the scan runtime, one stream "
                   "per object, frames shared in-graph)")
    p.add_argument("--video_path", default="/root/reference/assets/test.mp4")
    p.add_argument("--output_path", default="outputs/test.mp4")
    p.add_argument("--weights_path", default=DEFAULT_WEIGHTS)
    p.add_argument("--model", default="fear_xs",
                   choices=["fear_tiny", "fear_xs", "fear_m", "fear_l"],
                   help="family trunk to build — pair with matching zoo "
                   "weights, e.g. --model fear_m --weights_path fear_m_repo")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--smooth", action="store_true", help="penalty-window decode + size smoothing")
    p.add_argument("--platform", default="", help="force jax platform (e.g. cpu)")
    p.add_argument("--runtime", choices=["host", "scan"], default="host",
                   help="host = reference-API tracker; scan = on-device lax.scan runtime")
    p.add_argument("--dynamic_template", action="store_true", help="dual-template update (scan runtime)")
    p.add_argument("--update_interval", type=int, default=1,
                   help="consider a template refresh every K-th frame (scan runtime)")
    p.add_argument("--recover_context", type=float, default=0.0,
                   help="zoom-out re-acquisition context after a low-confidence "
                   "frame (0 = off; 3 recommended for occlusion-heavy content)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from feartracker_tpu.utils.video import draw_bbox, read_video, video_fps, write_video

    if len(args.initial_bbox) % 4:
        p.error(f"--initial_bbox takes N×4 ints, got {len(args.initial_bbox)}")
    num_objects = len(args.initial_bbox) // 4
    init_boxes = np.array(args.initial_bbox).reshape(num_objects, 4)

    frames = read_video(args.video_path, max_frames=args.max_frames)
    if args.runtime == "scan" or num_objects > 1:
        bboxes = track_scan(args.weights_path, frames,
                            init_boxes if num_objects > 1 else init_boxes[0],
                            smooth=args.smooth, dynamic_template=args.dynamic_template,
                            update_interval=args.update_interval,
                            recover_context=args.recover_context,
                            model_name=args.model)
    else:
        tracker = get_tracker(args.weights_path, smooth=args.smooth,
                              recover_context=args.recover_context,
                              model_name=args.model)
        bboxes = track(tracker, frames, init_boxes[0])

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    colors = [(0, 255, 0), (255, 80, 0), (0, 120, 255), (255, 0, 200),
              (255, 220, 0), (0, 255, 220)]

    def draw(frame, per_frame):
        boxes = np.atleast_2d(np.asarray(per_frame))
        for i, b in enumerate(boxes):
            frame = draw_bbox(frame, b, color=colors[i % len(colors)])
        return frame

    write_video(args.output_path, [draw(f, b) for f, b in zip(frames, bboxes)], fps=video_fps(args.video_path))
    print(f"tracked {len(frames)} frames x {num_objects} object(s) -> {args.output_path}")
    final = np.atleast_2d(np.asarray(bboxes[-1]))
    if num_objects == 1:
        print("final bbox:", list(map(int, final[0])))
    else:
        for i, b in enumerate(final):
            print(f"final bbox [{i}]:", list(map(int, b)))


if __name__ == "__main__":
    main()
