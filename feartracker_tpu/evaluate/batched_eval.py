"""Batched multi-stream dataset evaluation on the scan runtime.

BASELINE.json config 4: "Batched multi-stream tracking: 64 videos/chip,
GOT-10k test eval (AO/SR)". Sequences are letterboxed to one canonical frame
size, grouped S at a time, and tracked together through the on-device
``lax.scan`` runtime — the TPU replaces the reference's one-video-at-a-time
Python loop with chip-wide stream batching. Host threads decode JPEGs and
fill fixed-shape chunks; predictions are mapped back to original coordinates
before scoring.

Letterboxing note: scoring happens in original frame coordinates, but the
tracker sees (canonical-resolution) letterboxed frames — sequences larger
than the canvas are evaluated at reduced resolution. MEASURED
(tools/letterbox_penalty.py, paired 2×-resolution scenes, 3 seeds, real
TPU): the reduced-resolution path is NOT a penalty on this model — ΔAO
+0.020 (drift) / +0.039 (pose) vs a fitting canvas, 95% CIs crossing zero;
and the batched runtime itself matches the sequential full-resolution
protocol within ±0.0005 AO. Bound-tested in
tests/test_quality_gate.py::test_letterbox_penalty_bounded; see
BENCHMARKS.md "Letterbox resolution penalty".
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Tuple

import cv2
import numpy as np

from feartracker_tpu.core.geometry import overlap_xywh_np
from feartracker_tpu.data.dataset import read_img
from feartracker_tpu.evaluate.got10k_eval import precision_stats, summarize
from feartracker_tpu.tracker.runtime import ScanTracker


def letterbox(frame: np.ndarray, hw: Tuple[int, int]) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Scale-preserving resize into an (H, W) canvas (top-left anchored).
    Returns (canvas, scale, placed (h, w))."""
    H, W = hw
    h, w = frame.shape[:2]
    scale = min(H / h, W / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((H, W, 3), frame.dtype)
    canvas[:nh, :nw] = resized
    return canvas, scale, (nh, nw)


def batched_evaluate(
    tracker: ScanTracker,
    dataset,
    streams: int = 16,
    frame_hw: Tuple[int, int] = (360, 640),
    chunk: int = 16,
    max_frames: Optional[int] = None,
    max_sequences: Optional[int] = None,
    decode_workers: int = 4,
    verbose: bool = False,
    sequence_stride: Tuple[int, int] = (0, 1),
) -> Dict[str, Any]:
    """Evaluate ``dataset`` (a SequenceDataset) S sequences at a time.
    ``max_sequences`` caps the run (sanity checks / val_percent).
    ``sequence_stride=(rank, world)`` restricts to every world-th scorable
    sequence starting at rank — the multi-host validation shard (applied
    AFTER the max_sequences cap so every host agrees on the capped set)."""
    # sequences need at least an init frame + one scored frame (GOT-10k test
    # groundtruth carries only the init row — those cannot be scored locally)
    scorable = [
        i for i in range(len(dataset))
        if min(len(dataset[i][0]), len(dataset[i][1])) >= 2
    ]
    skipped = len(dataset) - len(scorable)
    if skipped and verbose:
        print(f"  skipping {skipped} sequences with <2 annotated frames")
    if max_sequences is not None:
        scorable = scorable[: max(int(max_sequences), 0)]
    rank, world = sequence_stride
    if world > 1:
        scorable = scorable[rank::world]
    if not scorable:
        return summarize([], [], [])

    pool = ThreadPoolExecutor(decode_workers)
    seq_overlaps: List[np.ndarray] = []
    seq_names: List[str] = []
    seq_precision: List[Dict[str, np.ndarray]] = []

    # sharded trackers need the stream axis divisible by the mesh: pad short
    # groups by repeating the last sequence; padded streams are tracked but
    # never scored
    mesh = getattr(tracker, "mesh", None)
    divisor = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1

    for g0 in range(0, len(scorable), streams):
        idxs = scorable[g0 : g0 + streams]
        S = len(idxs)  # scored streams; anything past S is padding
        pad = (-S) % divisor
        idxs = idxs + [idxs[-1]] * pad
        seqs = [dataset[i] for i in idxs]  # (files, anno, name)
        ST = len(seqs)  # tracked streams = S scored + pad
        lengths = [
            min(len(f), len(a), max_frames or 10**9) for f, a, _ in seqs
        ]
        max_len = max(lengths)

        def load(i_and_t):
            i, t = i_and_t
            files = seqs[i][0]
            t_eff = min(t, lengths[i] - 1)  # freeze on last frame after end
            return letterbox(read_img(files[t_eff]), frame_hw)[:2]

        # init; pad color = mean of the real image region, not the
        # letterbox bars (parity with ref fear_tracker.py:27)
        first = [letterbox(read_img(seqs[i][0][0]), frame_hw) for i in range(ST)]
        frames0 = np.stack([f for f, _, _ in first])
        scales = np.array([s for _, s, _ in first])
        mean_colors = np.stack([
            frames0[i][: first[i][2][0], : first[i][2][1]].astype(np.float64).mean(axis=(0, 1))
            for i in range(ST)
        ]).astype(np.float32)
        bb0 = np.stack([np.asarray(seqs[i][1][0], np.float64) * scales[i] for i in range(ST)]).astype(np.float32)
        state = tracker.init(frames0, bb0, mean_color=mean_colors)

        preds = [[np.asarray(seqs[i][1][0], np.float64)] for i in range(S)]
        t = 1
        while t < max_len:
            n = min(chunk, max_len - t)
            flat = list(pool.map(load, [(i, t + k) for k in range(n) for i in range(ST)]))
            frames = np.stack([f for f, _ in flat]).reshape(n, ST, *frame_hw, 3)
            state, out = tracker.track(state, frames, start_step=t - 1)
            bboxes = np.asarray(out["bbox"])  # (n, ST, 4)
            for k in range(n):
                for i in range(S):
                    if t + k < lengths[i]:
                        preds[i].append(bboxes[k, i].astype(np.float64) / scales[i])
            t += n

        for i in range(S):
            anno = np.asarray(seqs[i][1][: lengths[i]], np.float64)
            p = np.stack(preds[i])
            ov = _overlap(p[1:], anno[1:])
            seq_overlaps.append(ov)
            seq_precision.append(precision_stats(p[1:], anno[1:]))
            seq_names.append(dataset.sequence_name(idxs[i]))
            if verbose:
                print(f"  {seq_names[-1]}: AO={ov.mean():.3f} ({len(ov)} frames)")

    pool.shutdown()
    return summarize(seq_overlaps, seq_names, seq_precision)


_overlap = overlap_xywh_np
