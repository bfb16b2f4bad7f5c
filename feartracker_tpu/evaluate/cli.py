"""Evaluation CLI — the TPU analog of the reference's ``evaluate/`` tools.

    python -m feartracker_tpu.evaluate.cli macs
    python -m feartracker_tpu.evaluate.cli fps --streams 64 --protocol fps
    python -m feartracker_tpu.evaluate.cli got10k --root /data/got10k --subset val
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from feartracker_tpu.convert.load import default_weights_path

# reference export when mounted; else the packaged bit-identical archive
DEFAULT_WEIGHTS = default_weights_path()


def _load(args, dtype=None):
    """(model, variables) from ``--weights_path``, by format:
    ``.mlmodel`` = the reference's CoreML export (raw-protobuf recovery),
    ``.ckpt`` = a reference Lightning checkpoint, a directory = an Orbax
    training checkpoint from this framework (experiment dir, checkpoints
    root, step dir or state dir all accepted). Model geometry comes from
    ``--model_name/--adjust_channels/--towernum`` (defaults = FEAR-XS)."""
    import jax.numpy as jnp

    from feartracker_tpu.models.fbnet import TRUNKS
    from feartracker_tpu.models.fear_net import FEARNet

    path = args.weights_path
    ch, tn = args.adjust_channels, args.towernum
    model = FEARNet(
        dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
        trunk_blocks=TRUNKS[args.model_name],
        adjust_channels=ch,
        towernum=tn,
    )
    from feartracker_tpu.convert.load import load_variables

    return model, load_variables(path, channels=ch, towernum=tn)


def cmd_macs(args) -> None:
    from feartracker_tpu.evaluate.flops import track_cost

    model, variables = _load(args)
    cost = track_cost(model, variables)
    print(json.dumps({k: v for k, v in cost.items()}))


def cmd_fps(args) -> None:
    import jax.numpy as jnp

    from feartracker_tpu.evaluate import fps as F
    from feartracker_tpu.tracker.runtime import ScanTracker
    from feartracker_tpu.utils.video import read_video

    model, variables = _load(args, dtype="bfloat16")
    tracker = ScanTracker(model, variables, dtype=jnp.bfloat16,
                          dynamic_template=args.dynamic_template,
                          update_interval=args.update_interval,
                          trunk_impl=args.trunk_impl)
    S, T = args.streams, args.chunk
    try:
        video = read_video(args.video_path, max_frames=T + 1)
    except Exception:
        video = np.random.RandomState(0).randint(0, 255, (T + 1, 256, 480, 3), dtype=np.uint8)
    frames0 = jnp.asarray(np.broadcast_to(video[0], (S,) + video[0].shape))
    chunk = jnp.asarray(np.broadcast_to(video[1 : T + 1, None], (T, S) + video[0].shape))
    bboxes = jnp.asarray(np.tile(np.array([[163, 53, 45, 174]], np.float32), (S, 1)))

    state_holder = {"state": tracker.init(frames0, bboxes), "t": 0}

    def call():
        state_holder["state"], outs = tracker.track(
            state_holder["state"], chunk, start_step=state_holder["t"]
        )
        state_holder["t"] += T
        return outs

    def sync(outs):
        np.asarray(outs["bbox"][-1])

    if args.protocol == "fps":
        res = F.fps_benchmark(call, sync, csv_path=args.csv)
        res["tracked_fps"] = res["fps"] * S * T
        print(json.dumps(res))
        return

    # cadence/endurance protocols: pay the one-off jit compile before the
    # timed window opens (the FPS protocol's 20-call warmup analog — without
    # this, the first call's ~30-70 s compile counts as thousands of drops)
    for _ in range(args.warmup_calls):
        sync(call())
    if args.protocol == "online":
        res = F.online_benchmark(call, sync, duration_s=args.duration, input_fps=args.input_fps, csv_path=args.csv)
    elif args.protocol == "online_pipelined":
        res = F.pipelined_online_benchmark(
            call, sync, duration_s=args.duration, input_fps=args.input_fps,
            depth=args.pipeline_depth, csv_path=args.csv,
        )
    else:
        res = F.offline_benchmark(call, sync, duration_s=args.duration, fps=args.input_fps, csv_path=args.csv)
    print(json.dumps(res))


def cmd_eval(args) -> None:
    """Sequence-dataset evaluation/submission for any registry dataset."""
    from feartracker_tpu.data.sequence import DATASET_REGISTRY
    from feartracker_tpu.tracker.config import TrackerConfig

    cls = DATASET_REGISTRY[args.dataset]
    kwargs = {"subset": args.subset} if args.dataset in ("got10k", "trackingnet") else {}
    dataset = cls(args.root, **kwargs)
    cfg = TrackerConfig(smooth=args.smooth)
    rec = {"recover_context": args.recover_context}
    if args.batched and args.submit_dir:
        raise SystemExit("--submit_dir requires the sequential tracker; drop --batched")
    if args.supervised and (args.batched or args.submit_dir):
        raise SystemExit("--supervised runs the sequential re-init protocol; drop --batched/--submit_dir")
    if args.supervised:
        from feartracker_tpu.evaluate.vot_eval import evaluate_vot
        from feartracker_tpu.tracker.tracker import FEARTracker

        model, variables = _load(args)
        tracker = FEARTracker(model, variables, cfg, **rec)
        res = evaluate_vot(tracker, dataset, max_frames=args.max_frames, verbose=True)
    elif args.batched:
        import jax.numpy as jnp

        from feartracker_tpu.evaluate.batched_eval import batched_evaluate
        from feartracker_tpu.tracker.runtime import ScanTracker

        model, variables = _load(args, dtype="bfloat16")
        tracker = ScanTracker(model, variables, cfg, dtype=jnp.bfloat16, **rec)
        res = batched_evaluate(
            tracker, dataset, streams=args.streams, max_frames=args.max_frames,
            max_sequences=args.max_sequences, verbose=True,
        )
    elif args.submit_dir:
        from feartracker_tpu.evaluate.got10k_eval import (
            write_got10k_submission,
            write_trackingnet_submission,
        )
        from feartracker_tpu.tracker.tracker import FEARTracker

        writers = {"got10k": write_got10k_submission, "trackingnet": write_trackingnet_submission}
        if args.dataset not in writers:
            raise SystemExit(f"--submit_dir supports {sorted(writers)}, not {args.dataset!r}")
        model, variables = _load(args)
        tracker = FEARTracker(model, variables, cfg, **rec)
        out = writers[args.dataset](
            tracker, dataset, args.submit_dir, max_frames=args.max_frames, verbose=True
        )
        res = {"submission_dir": out, "num_sequences": len(dataset)}
    else:
        from feartracker_tpu.evaluate.got10k_eval import evaluate_tracker
        from feartracker_tpu.tracker.tracker import FEARTracker

        model, variables = _load(args)
        tracker = FEARTracker(model, variables, cfg, **rec)
        res = evaluate_tracker(
            tracker, dataset, max_frames=args.max_frames,
            max_sequences=args.max_sequences, verbose=True,
        )
    if args.report:
        import os

        os.makedirs(os.path.dirname(args.report) or ".", exist_ok=True)
        with open(args.report, "w") as fh:
            json.dump(res, fh, indent=1)
    if args.plot or args.plot_precision:
        if "success_curve" not in res:
            raise SystemExit("--plot/--plot_precision need OPE curves (AO-style eval, not --supervised/--submit_dir)")
        import os

        from feartracker_tpu.evaluate.plots import plot_precision, plot_success

        name = os.path.splitext(os.path.basename(args.weights_path.rstrip("/")))[0]
        if args.plot:
            os.makedirs(os.path.dirname(args.plot) or ".", exist_ok=True)
            plot_success({name: res["success_curve"]}, args.plot,
                         title=f"Success plot (OPE) — {args.dataset}")
        if args.plot_precision:
            if "precision_curve" not in res:
                raise SystemExit("--plot_precision: no precision curve (no scored sequences)")
            os.makedirs(os.path.dirname(args.plot_precision) or ".", exist_ok=True)
            plot_precision({name: res["precision_curve"]}, args.plot_precision,
                           title=f"Precision plot (OPE) — {args.dataset}")
    curves = ("per_sequence", "success_curve", "precision_curve", "norm_precision_curve")
    print(json.dumps({k: v for k, v in res.items() if k not in curves}))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default="",
                   help="jax platform override (e.g. 'cpu' — the env var is "
                        "pinned by sitecustomize here, so use this flag)")
    p.add_argument("--weights_path", default=DEFAULT_WEIGHTS,
                   help=".mlmodel (CoreML export), .ckpt (Lightning), or an "
                        "Orbax training-checkpoint/experiment directory")
    # model geometry for checkpoint loading (defaults = FEAR-XS, matching the
    # .mlmodel recovery path)
    from feartracker_tpu.models.fbnet import TRUNKS

    p.add_argument("--model_name", choices=sorted(TRUNKS), default="fear_xs")
    p.add_argument("--adjust_channels", type=int, default=256)
    p.add_argument("--towernum", type=int, default=2)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("macs")

    fp = sub.add_parser("fps")
    fp.add_argument("--protocol", choices=["fps", "online", "online_pipelined", "offline"], default="fps")
    fp.add_argument("--pipeline_depth", type=int, default=2)
    fp.add_argument("--warmup_calls", type=int, default=1,
                    help="un-timed calls before the online/offline protocols (compile warmup)")
    fp.add_argument("--streams", type=int, default=64)
    fp.add_argument("--chunk", type=int, default=64,
                    help="frames per call (T=64 amortizes dispatch best — BENCHMARKS.md)")
    fp.add_argument("--duration", type=float, default=30.0)
    fp.add_argument("--input_fps", type=float, default=30.0)
    fp.add_argument("--video_path", default="/root/reference/assets/test.mp4")
    fp.add_argument("--csv", default=None)
    fp.add_argument("--dynamic_template", action="store_true")
    fp.add_argument("--update_interval", type=int, default=1)
    fp.add_argument("--trunk_impl", choices=["xla", "fused"], default="xla",
                    help="'fused' = fused IR-block Pallas trunk (opt-in; "
                         "measured slower than XLA on v5e — see BENCHMARKS.md)")

    from feartracker_tpu.data.sequence import DATASET_REGISTRY

    # `got10k` kept as an alias of `eval --dataset got10k` (original CLI)
    for cmd_name in ("got10k", "eval"):
        gp = sub.add_parser(cmd_name)
        if cmd_name == "eval":
            gp.add_argument("--dataset", choices=sorted(DATASET_REGISTRY), default="got10k")
        gp.add_argument("--root", required=True)
        gp.add_argument("--subset", default="val")
        gp.add_argument("--max_frames", type=int, default=None)
        gp.add_argument("--max_sequences", type=int, default=None)
        gp.add_argument("--smooth", action="store_true")
        gp.add_argument("--batched", action="store_true", help="multi-stream scan runtime")
        gp.add_argument("--supervised", action="store_true",
                        help="VOT supervised protocol (re-init on failure): accuracy/robustness/EAO")
        gp.add_argument("--streams", type=int, default=64)
        gp.add_argument("--recover_context", type=float, default=0.0,
                        help="zoom-out re-acquisition context after a "
                        "low-confidence frame (0 = off; 3 recommended for "
                        "occlusion-heavy content, BENCHMARKS.md)")
        gp.add_argument("--submit_dir", default=None, help="write eval-server submission files here")
        gp.add_argument("--report", default=None,
                        help="also write the full result (incl. per-sequence) as JSON here")
        gp.add_argument("--plot", default=None,
                        help="write an OPE success plot (PNG) here")
        gp.add_argument("--plot_precision", default=None,
                        help="write an OPE precision plot (PNG) here")

    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.cmd == "got10k":
        args.dataset = "got10k"
    {"macs": cmd_macs, "fps": cmd_fps, "got10k": cmd_eval, "eval": cmd_eval}[args.cmd](args)


if __name__ == "__main__":
    main()
