"""Shared setup for the throughput/profiling harnesses.

bench.py, tools/sweep_streams.py and tools/roofline.py all benchmark the same
object — a bf16 ScanTracker with the recovered FEAR-XS weights over S
synthetic 256×480 streams. The construction, weight-provenance fallback and
input synthesis live here once so the protocol cannot silently diverge
between the headline bench and the analysis tools.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np

TRACKER_ML = "/root/reference/evaluate/FEARDemo/FEARDemo/Tracker.mlmodel"
DEMO_BBOX = (163.0, 53.0, 45.0, 174.0)  # demo_video.py default initial box


def build_scan_tracker(
    weights_path: str = TRACKER_ML,
    dtype=None,
    postprocess_impl: str = "pallas",
    model_name: str = "fear_xs",
    towernum: int = 2,
    **tracker_kw,
):
    """(ScanTracker, weights_provenance) — provenance is "fear_xs" (the
    recovered reference checkpoint), the basename of a custom weights file,
    or "random" when nothing loads (same compute, uncredited numbers; see
    bench.py's JSON schema). ``model_name`` selects a family trunk from
    models/fbnet.TRUNKS (fear_m / fear_l quality evals ride their own
    repo-trained weights — there is no reference fallback for them)."""
    import os

    import jax
    import jax.numpy as jnp

    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.runtime import ScanTracker

    dtype = jnp.bfloat16 if dtype is None else dtype
    # fall back from the requested source to the packaged standalone archive
    # (same recovered weights, tools/export_weights.py) before conceding to
    # random weights
    from feartracker_tpu.convert.load import PACKAGED_FEAR_XS, load_variables

    if model_name == "fear_xs":
        model = FEARNet(dtype=dtype, towernum=towernum)
        candidates = (weights_path, PACKAGED_FEAR_XS)
    else:
        from feartracker_tpu.models.fbnet import TRUNKS

        model = FEARNet(trunk_blocks=TRUNKS[model_name], towernum=towernum, dtype=dtype)
        # the recovered reference checkpoint is XS-shaped — family models only
        # load weights the caller explicitly provides (else: random init)
        candidates = () if weights_path == TRACKER_ML else (weights_path,)
        err = ValueError(f"no weights provided for {model_name}")

    variables = None
    for candidate in candidates:
        try:
            variables = load_variables(candidate)
            provenance = (
                "fear_xs" if candidate in (TRACKER_ML, PACKAGED_FEAR_XS)
                else os.path.basename(candidate)
            )
            break
        except Exception as e:
            err = e
    if variables is None:
        print(
            f"[bench] WARNING: could not load FEAR-XS weights ({err!r}, "
            f"incl. the packaged archive at {PACKAGED_FEAR_XS}); benchmarking "
            f"with random weights",
            file=sys.stderr,
        )
        provenance = "random"
        variables = model.init(
            jax.random.PRNGKey(0),
            (jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 256, 256, 3))),
            train=False,
        )
    tracker = ScanTracker(
        model, variables, dtype=dtype, postprocess_impl=postprocess_impl, **tracker_kw
    )
    return tracker, provenance


def synthetic_streams(
    streams: int,
    chunk: int,
    frame_hw: Tuple[int, int] = (256, 480),
    seed: int = 0,
    video=None,
):
    """Device-resident (frames0 (S,H,W,3) u8, chunk (T,S,H,W,3) u8,
    bboxes (S,4) f32). ``video`` (T+1,H,W,3) overrides the random frames
    (every stream sees the same pixels — throughput is data-independent).
    One S's worth is ~0.4 GB/100 streams at 256×480; callers sweeping S must
    keep a single setup live at a time (HBM)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    H, W = frame_hw
    if video is None:
        video = rng.randint(0, 255, (chunk + 1, H, W, 3), dtype=np.uint8)
    frames0 = jnp.asarray(np.broadcast_to(video[0], (streams, H, W, 3)))
    chunk_frames = jnp.asarray(
        np.broadcast_to(video[1 : chunk + 1, None], (chunk, streams, H, W, 3))
    )
    bboxes = jnp.asarray(np.tile(np.asarray([DEMO_BBOX], np.float32), (streams, 1)))
    return frames0, chunk_frames, bboxes
