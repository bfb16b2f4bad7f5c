"""Siamese training dataset: CSV annotations → augmented (template, search)
crop pairs with encoded label maps.

Re-implementation of the reference's dataset stack
(ref: model_training/dataset/tracking_dataset.py + siam_dataset.py) with the
same crop geometry and label semantics, producing NHWC float32 numpy arrays
ready for device upload. Label encoding reuses the pure-JAX box coder on host
via numpy (encode is closed-form math).
"""

from __future__ import annotations

import ast
import os
from typing import Any, Dict, Optional, Sequence

import cv2
import numpy as np

from feartracker_tpu.core.geometry import center_to_bbox, ensure_bbox_boundaries, handle_empty_bbox
from feartracker_tpu.core.grids import make_grid_np
from feartracker_tpu.data.augmentations import (
    BBoxCropWithOffsets,
    photometric_augmentations,
    tracking_augmentations,
)
from feartracker_tpu.data.crops import get_extended_crop
from feartracker_tpu.data.labels import get_regression_weight_label
from feartracker_tpu.data.samplers import FrameSampler, TrackSampler
from feartracker_tpu.utils import constants as C
from feartracker_tpu.utils.image import normalize_imagenet_np as _normalize

SAMPLER_TYPES = {"track": TrackSampler, "frame": FrameSampler}


class ImageCache:
    """Thread-safe decoded-frame LRU keyed by absolute path.

    Multi-epoch training re-decodes the same JPEGs every epoch; on a
    host whose loader is decode-bound (measured: tools/loader_throughput.py)
    this cache turns every post-first-epoch read into a memcpy. Hits return
    a copy so downstream augmentation can never alias the cached frame.
    The reference has no equivalent — its torch DataLoader worker processes
    re-decode per epoch (ref: base_lightning_model.py:113-132).
    """

    def __init__(self, max_items: int = 16384):
        import collections
        import threading

        self.max_items = int(max_items)
        self._d: "collections.OrderedDict[str, np.ndarray]" = collections.OrderedDict()
        self._lock = threading.Lock()

    def read(self, path: str) -> np.ndarray:
        with self._lock:
            img = self._d.get(path)
            if img is not None:
                self._d.move_to_end(path)
                return img.copy()
        img = read_img(path)
        with self._lock:
            self._d[path] = img
            if len(self._d) > self.max_items:
                self._d.popitem(last=False)
        return img.copy()


def read_img(path: str) -> np.ndarray:
    """(ref: dataset/utils.py:35-43)"""
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"cannot read image {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def encode_maps_np(bbox: np.ndarray, score_size: int, stride: int, instance_size: int):
    """Host twin of core.box_coder.encode for a single box (numpy)."""
    gx, gy = make_grid_np(score_size, stride, instance_size)
    left = gx - bbox[0]
    top = gy - bbox[1]
    right = bbox[0] + bbox[2] - gx
    bottom = bbox[1] + bbox[3] - gy
    reg = np.stack((left, top, right, bottom), axis=-1).astype(np.float32)
    cls = (reg.min(axis=-1, keepdims=True) > 0).astype(np.float32)
    return reg, cls


class SiameseTrackingDataset:
    """One CSV-annotated dataset (ref: siam_dataset.py:28-67)."""

    def __init__(self, config: Dict[str, Any], tracker_config: Dict[str, Any], seed: Optional[int] = None):
        self.config = config
        self.tracker_config = tracker_config
        sizes = dict(config["sizes"])
        self.sizes = sizes
        sampling = dict(config["sampling"])
        sampler_cls = SAMPLER_TYPES[sampling.pop("type", "track")]
        self.item_sampler = sampler_cls(**sampling, seed=seed)
        self.item_sampler.parse_samples()
        # search context doubles, randomized inside a range
        # (ref: tracking_dataset.py:50,102-105)
        self.search_context = sizes["search_context"] * 2
        self.context_range = sizes.get("context_range", 0.5)
        self.grid_size = config.get("regression_weight_label_size", tracker_config.get("score_size", 16))
        self.root = config.get("root", "")
        self.name = config.get("name", os.path.basename(str(self.root)) or "dataset")
        self.photometric = photometric_augmentations()
        self.paired_color = tracking_augmentations()
        # emit an auxiliary later-frame template crop for dual-template
        # training (paper feature; reference README.md:96)
        self.dynamic_template = bool(config.get("dynamic_template", False))
        # staged mode: stop after host geometry (uint8 context crops) and let
        # the jitted train step do random crop + augs + normalize + labels on
        # device (data/device_augs.py) — unblocks host-bound training on TPU
        self.device_augs = bool(config.get("device_augs", False))
        # per-item RNGs are derived from (seed, epoch, idx) inside
        # __getitem__: a single shared RandomState would interleave draws
        # nondeterministically across the loader's worker threads
        self.base_seed = 0 if seed is None else int(seed)
        self.epoch = 0
        # decoded-frame LRU (config "image_cache": true or a max-item count);
        # off by default — opt in for multi-epoch runs on decode-bound hosts
        cache_cfg = config.get("image_cache", 0)
        self._image_cache: Optional[ImageCache] = (
            ImageCache(16384 if cache_cfg is True else int(cache_cfg))
            if cache_cfg else None
        )

    def _read(self, path: str) -> np.ndarray:
        if self._image_cache is not None:
            return self._image_cache.read(path)
        return read_img(path)

    def __len__(self) -> int:
        return len(self.item_sampler)

    def resample(self) -> None:
        self.epoch += 1
        self.item_sampler.resample()

    def _item_rng(self, idx: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.base_seed * 1000003 + self.epoch * 10007 + idx) % (2**31 - 1)
        )

    # -- crop transforms (ref: tracking_dataset.py:102-153) ----------------

    def _search_offset(self, rng: np.random.RandomState) -> float:
        min_context = self.search_context - self.context_range / 2
        return float(rng.rand()) * self.context_range + min_context

    def _search_transform(self, image: np.ndarray, bbox: np.ndarray, rng: np.random.RandomState):
        size = self.sizes["search_image_size"]
        crop, bbox2, _ = get_extended_crop(image, bbox, crop_size=size * 2, offset=self._search_offset(rng))
        bbox_crop = center_to_bbox([crop.shape[0] // 2, crop.shape[1] // 2, size, size])
        aug = BBoxCropWithOffsets(
            bbox_crop=bbox_crop,
            scale=self.sizes["search_image_scale"],
            shift=self.sizes["search_image_shift"],
            crop_size=size,
        )
        crop, bbox3 = aug(crop, bbox2, rng)
        bbox3 = handle_empty_bbox(ensure_bbox_boundaries(np.asarray(bbox3), (size, size)))
        return crop, bbox3

    def _template_transform(self, image: np.ndarray, bbox: np.ndarray):
        size = self.sizes["template_image_size"]
        crop, bbox2, _ = get_extended_crop(
            image, bbox, crop_size=size, offset=self.sizes["template_bbox_offset"]
        )
        bbox2 = handle_empty_bbox(ensure_bbox_boundaries(np.asarray(bbox2), (size, size)))
        return crop, bbox2

    def _sample_aux_template(self, idx, rng, template_item) -> np.ndarray:
        """Nearby-frame auxiliary template crop for dual-template training;
        must contain the object — retry on presence==0 rows, fall back to the
        template frame itself."""
        aux_item = None
        for _ in range(4):
            cand = self.item_sampler.extract_sample(idx, rng=rng)["search"]
            if int(cand["presence"]) == 1:
                aux_item = cand
                break
        if aux_item is None:
            aux_item = template_item
        aux_image = self._read(os.path.join(self.root, aux_item["img_path"]))
        aux_bbox = ensure_bbox_boundaries(
            np.asarray(ast.literal_eval(str(aux_item["bbox"]))), aux_image.shape[:2]
        )
        aux, _ = self._template_transform(aux_image, aux_bbox)
        return aux

    def _staged_item(
        self, idx, rng, template_crop, template_bbox,
        search_image, search_bbox, template_item, search_item, presence,
    ) -> Dict[str, Any]:
        """Device-augs mode: host work stops at the doubled-context search
        crop (uint8) + final-geometry template crop (uint8); the train step
        runs data/device_augs.augment_batch for the rest."""
        from feartracker_tpu.data.device_augs import STAGED_SEARCH_BBOX_KEY, STAGED_SEARCH_KEY

        size = self.sizes["search_image_size"]
        staged, staged_bbox, _ = get_extended_crop(
            search_image, search_bbox, crop_size=size * 2, offset=self._search_offset(rng)
        )
        item = {
            STAGED_SEARCH_KEY: staged.astype(np.uint8),
            STAGED_SEARCH_BBOX_KEY: np.asarray(staged_bbox, np.float32),
            C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: template_crop.astype(np.uint8),
            C.TRACKER_TEMPLATE_BBOX_KEY: template_bbox.astype(np.float32),
            C.TARGET_VISIBILITY_KEY: np.asarray([presence], np.float32),
            C.TRACKER_TARGET_SEARCH_FILENAME_KEY: str(search_item["img_path"]),
            C.TRACKER_TARGET_TEMPLATE_FILENAME_KEY: str(template_item["img_path"]),
            C.DATASET_NAME_KEY: str(search_item.get("dataset", self.name)),
            C.SAMPLE_INDEX_KEY: idx,
        }
        if self.dynamic_template:
            aux = self._sample_aux_template(idx, rng, template_item)
            item[C.TRACKER_TARGET_AUX_IMAGE_KEY] = aux.astype(np.uint8)
        return item

    # -- item assembly ------------------------------------------------------

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        rng = self._item_rng(idx)
        anno = self.item_sampler.extract_sample(idx, rng=rng)
        template_item, search_item = anno["template"], anno["search"]
        template_image = self._read(os.path.join(self.root, template_item["img_path"]))
        search_image = self._read(os.path.join(self.root, search_item["img_path"]))
        template_bbox = ensure_bbox_boundaries(
            np.asarray(ast.literal_eval(str(template_item["bbox"]))), template_image.shape[:2]
        )
        search_bbox = ensure_bbox_boundaries(
            np.asarray(ast.literal_eval(str(search_item["bbox"]))), search_image.shape[:2]
        )
        presence = int(search_item["presence"])

        template_crop, template_bbox = self._template_transform(template_image, template_bbox)
        if self.device_augs:
            return self._staged_item(
                idx, rng, template_crop, template_bbox,
                search_image, search_bbox, template_item, search_item, presence,
            )
        search_crop, search_bbox = self._search_transform(search_image, search_bbox, rng)
        aux = None
        if self.dynamic_template:
            aux = self._sample_aux_template(idx, rng, template_item)
        # shared-parameter color augs across the group (ref: siam_dataset.py:36,64-67)
        if aux is None:
            template_crop, search_crop = self.paired_color(template_crop, search_crop, rng)
        else:
            template_crop, search_crop, aux = self.paired_color(template_crop, search_crop, aux, rng)
            aux = self.photometric(aux, rng)
        # independent photometric augs (ref: tracking_dataset.py:170-175)
        template_crop = self.photometric(template_crop, rng)
        search_crop = self.photometric(search_crop, rng)

        size = self.sizes["search_image_size"]
        search_bbox = ensure_bbox_boundaries(np.asarray(search_bbox), (size, size))

        if presence:
            weight = get_regression_weight_label(search_bbox, size, self.grid_size)
            reg, cls = encode_maps_np(
                search_bbox.astype(np.float32),
                self.grid_size,
                self.tracker_config.get("total_stride", 16),
                size,
            )
        else:  # (ref: siam_dataset.py:49-52)
            weight = np.zeros((self.grid_size, self.grid_size), np.float32)
            reg = np.zeros((self.grid_size, self.grid_size, 4), np.float32)
            cls = np.zeros((self.grid_size, self.grid_size, 1), np.float32)

        item = {
            C.TARGET_REGRESSION_LABEL_KEY: reg,
            C.TARGET_CLASSIFICATION_KEY: cls,
            C.TARGET_REGRESSION_WEIGHT_KEY: weight,
            C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY: _normalize(template_crop),
            C.TRACKER_TEMPLATE_BBOX_KEY: template_bbox.astype(np.float32),
            C.TRACKER_TARGET_SEARCH_IMAGE_KEY: _normalize(search_crop),
            C.TRACKER_TARGET_BBOX_KEY: search_bbox.astype(np.float32),
            C.TARGET_VISIBILITY_KEY: np.asarray([presence], np.float32),
            C.TRACKER_TARGET_SEARCH_FILENAME_KEY: str(search_item["img_path"]),
            C.TRACKER_TARGET_TEMPLATE_FILENAME_KEY: str(template_item["img_path"]),
            C.DATASET_NAME_KEY: str(search_item.get("dataset", self.name)),
            C.SAMPLE_INDEX_KEY: idx,
        }
        if aux is not None:
            item[C.TRACKER_TARGET_AUX_IMAGE_KEY] = _normalize(aux)
        return item



class ConcatDataset:
    """Minimal torch-style concat with per-dataset resample passthrough
    (ref: dataset/__init__.py:56-68, fear_lightning_model.py:260-264)."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self._lengths = [len(d) for d in self.datasets]

    def __len__(self) -> int:
        return sum(self._lengths)

    def __getitem__(self, idx: int):
        for d, n in zip(self.datasets, self._lengths):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)

    def resample(self) -> None:
        for d in self.datasets:
            d.resample()
        self._lengths = [len(d) for d in self.datasets]


def get_training_datasets(config: Dict[str, Any], seed: Optional[int] = None) -> ConcatDataset:
    """Build the train ConcatDataset from a composed config
    (ref: dataset/__init__.py:56-63)."""
    datasets = []
    for i, ds_cfg in enumerate(config["train"]["datasets"]):
        datasets.append(
            SiameseTrackingDataset(ds_cfg, config.get("tracker", {}), seed=None if seed is None else seed + i)
        )
    return ConcatDataset(datasets)
