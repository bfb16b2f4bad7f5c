"""Siamese-pair samplers over CSV-annotated video datasets.

Re-implementation of the reference's pandas samplers
(ref: model_training/dataset/track_sampling.py). CSV schema per the
reference README (README.md:84-93): sequence_id, track_id, frame_index,
img_path, bbox "x, y, w, h", frame_shape, dataset, presence, near_corner.

Semantics preserved:
  * negative (presence==0) rows are dropped down to ``negative_ratio``
    (track_sampling.py:69-78);
  * templates are rows with presence==1 and not near_corner
    (track_sampling.py:93);
  * per-epoch track-balanced ``resample()`` (track_sampling.py:80-89);
  * the search frame is drawn within ±``frame_offset`` of the template when
    ``clip_range`` (track_sampling.py:98-115) — ``frame_offset`` is mutable
    for the dynamic-frame-offset curriculum (fear_lightning_model.py:266-284).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd


class TrackSampler:
    def __init__(
        self,
        data_path: str,
        negative_ratio: float = 0.0,
        frame_offset: int = 70,
        num_samples: int = 100000,
        clip_range: bool = False,
        seed: Optional[int] = None,
    ):
        self.data_path = data_path
        self.negative_ratio = negative_ratio
        self.frame_offset = frame_offset
        self.num_samples = num_samples
        self.clip_range = clip_range
        self.rng = np.random.RandomState(seed)
        self.data: Optional[pd.DataFrame] = None
        self.template_data: Optional[pd.DataFrame] = None
        self.epoch_data: Optional[pd.DataFrame] = None
        self.mapping = None
        self.num_tracks = 0

    def __len__(self) -> int:
        return 0 if self.epoch_data is None else len(self.epoch_data)

    def _read_data(self) -> pd.DataFrame:
        data = pd.read_csv(self.data_path)
        negative = data[data["presence"] == 0]
        if len(data):
            neg_ratio = len(negative) / len(data)
            keep = max(0, int(min(neg_ratio, self.negative_ratio) * len(data)))
            drop = len(negative) - keep
            dropped = self.rng.choice(negative.index, drop, replace=False)
            data = data.drop(dropped).reset_index(drop=True)
        return data

    def parse_samples(self) -> None:
        self.data = self._read_data()
        self.template_data = self.data[
            (self.data["presence"] == 1) & (~self.data["near_corner"].astype(bool))
        ]
        self.num_tracks = self.template_data["track_id"].nunique()
        self.mapping = self.data.groupby("track_id").groups
        self.resample()

    def resample(self) -> None:
        """Track-balanced per-epoch template draw (track_sampling.py:80-89)."""
        n = min(self.num_samples, max(len(self.template_data), 1))
        if self.num_tracks == len(self.template_data):
            self.epoch_data = self.template_data.sample(
                n, random_state=self.rng, replace=len(self.template_data) < n
            ).reset_index(drop=True)
        else:
            per_track = int(math.ceil(n / max(self.num_tracks, 1)))
            self.epoch_data = (
                self.template_data.groupby("track_id")
                .sample(per_track, replace=True, random_state=self.rng)
                .sample(n, random_state=self.rng)
                .reset_index(drop=True)
            )

    def _pair_for_template(self, template_item, rng: np.random.RandomState) -> Dict[str, Any]:
        """Draw the search frame for a template row: within ±frame_offset of
        it when ``clip_range``, else uniformly from the track
        (track_sampling.py:98-115)."""
        track_indices = self.mapping[template_item["track_id"]]
        if self.clip_range:
            search_items = self.data.loc[track_indices]
            in_range = search_items[
                (search_items["frame_index"] > template_item["frame_index"] - self.frame_offset)
                & (search_items["frame_index"] < template_item["frame_index"] + self.frame_offset)
            ]
            search_item = in_range.sample(1, random_state=rng).iloc[0]
        else:
            search_item = self.data.loc[rng.choice(track_indices)]
        return dict(template=template_item, search=search_item)

    def extract_sample(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict[str, Any]:
        rng = self.rng if rng is None else rng  # callers pass a per-item rng for thread safety
        return self._pair_for_template(self.epoch_data.iloc[idx], rng)


class FrameSampler(TrackSampler):
    """Every eligible frame is a template exactly once per epoch — a
    deterministic walk over the dataset instead of TrackSampler's
    track-balanced random draw (ref: track_sampling.py:118-186).

    Differences from TrackSampler, re-derived from the reference:
      * negative drop count is ``int((neg_ratio - negative_ratio) * len)``
        — proportional to the *excess* negative fraction
        (track_sampling.py:139-146) rather than TrackSampler's
        keep-then-subtract form. (The reference draws the rows to drop
        *with* replacement, so duplicate draws silently under-drop; we draw
        without replacement so the count is exact and seeded-deterministic.)
      * ``resample()`` is a no-op: the epoch enumeration is the fixed
        ``indices`` list (track_sampling.py:30-31 inherited pass);
      * ``num_samples is None`` means "use every eligible frame"
        (track_sampling.py:152-153), and ``__len__`` clips to the number of
        eligible frames (track_sampling.py:136-137).
    """

    def __init__(self, *args, num_samples: Optional[int] = None, **kwargs):
        super().__init__(*args, num_samples=num_samples, **kwargs)
        self.indices: Optional[List[int]] = None

    def __len__(self) -> int:
        if self.indices is None:
            return 0
        return min(self.num_samples, len(self.indices))

    def _read_data(self) -> pd.DataFrame:
        """FrameSampler negative-drop variant (track_sampling.py:139-146)."""
        data = pd.read_csv(self.data_path)
        negative = data[data["presence"] == 0]
        if len(data):
            neg_ratio = len(negative) / len(data)
            drop = max(0, int((neg_ratio - self.negative_ratio) * len(data)))
            drop = min(drop, len(negative))
            dropped = self.rng.choice(negative.index, drop, replace=False)
            data = data.drop(dropped).reset_index(drop=True)
        return data

    def parse_samples(self) -> None:
        self.data = self._read_data()
        self.mapping = self.data.groupby("track_id").groups
        self.indices = list(
            self.data[(self.data["presence"] == 1) & (~self.data["near_corner"].astype(bool))].index
        )
        if self.num_samples is None:
            self.num_samples = len(self.indices)

    def resample(self) -> None:
        """No-op: every epoch enumerates the same eligible-frame list."""

    def extract_sample(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict[str, Any]:
        rng = self.rng if rng is None else rng
        return self._pair_for_template(self.data.loc[self.indices[idx]], rng)
