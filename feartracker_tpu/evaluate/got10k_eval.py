"""GOT-10k-style tracking evaluation: AO / SR@0.5 / SR@0.75.

Replaces the reference's dependency on the got10k toolkit experiment classes
(the reference only used the toolkit's dataset wrappers for in-training
validation; a full offline AO/SR evaluation harness is part of the BASELINE
configs). Metrics follow the GOT-10k protocol: per-sequence mean overlap,
averaged over sequences (AO); success rates are the fraction of frames with
overlap above threshold.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from feartracker_tpu.core.geometry_jax import box_iou_xywh
from feartracker_tpu.data.dataset import read_img
from feartracker_tpu.data.sequence import SequenceDataset


def _overlap(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(box_iou_xywh(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))


def evaluate_tracker(
    tracker,
    dataset: SequenceDataset,
    max_frames: Optional[int] = None,
    verbose: bool = False,
) -> Dict[str, Any]:
    """Run the tracker over every sequence; returns AO/SR + per-sequence data."""
    seq_overlaps: List[np.ndarray] = []
    seq_names: List[str] = []
    for s in range(len(dataset)):
        files, anno, _ = dataset[s]
        n = min(len(files), len(anno))
        if n < 2:  # e.g. GOT-10k test: groundtruth has only the init row
            if verbose:
                print(f"  skipping {dataset.sequence_name(s)}: <2 annotated frames")
            continue
        if max_frames:
            n = min(n, max_frames)
        tracker.initialize(read_img(files[0]), np.asarray(anno[0], int))
        preds = [np.asarray(anno[0], np.float64)]
        for i in range(1, n):
            preds.append(np.asarray(tracker.update(read_img(files[i]))["bbox"], np.float64))
        ov = _overlap(np.stack(preds[1:]), np.asarray(anno[1:n], np.float64))
        seq_overlaps.append(ov)
        seq_names.append(dataset.sequence_name(s))
        if verbose:
            print(f"  {seq_names[-1]}: AO={ov.mean():.3f} over {len(ov)} frames")
    return summarize(seq_overlaps, seq_names)


def summarize(seq_overlaps: Sequence[np.ndarray], seq_names: Sequence[str]) -> Dict[str, Any]:
    per_seq_ao = np.array([ov.mean() for ov in seq_overlaps]) if seq_overlaps else np.zeros(0)
    return {
        "ao": float(per_seq_ao.mean()) if len(per_seq_ao) else 0.0,
        "sr50": float(np.mean([(ov > 0.5).mean() for ov in seq_overlaps])) if seq_overlaps else 0.0,
        "sr75": float(np.mean([(ov > 0.75).mean() for ov in seq_overlaps])) if seq_overlaps else 0.0,
        "per_sequence": {name: float(ao) for name, ao in zip(seq_names, per_seq_ao)},
        "num_sequences": len(seq_overlaps),
    }
