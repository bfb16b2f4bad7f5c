"""Device-side training augmentation — the TPU-native L3 hot path.

The reference augments on the host with albumentations (ref: aug.py:8-49,
52-142; tracking_dataset.py:102-175; siam_dataset.py:33-67), which makes the
training loop HOST-bound on TPU (measured: 1.2 s/step wall vs 37 ms device
step on this 1-core box; a real TPU-VM needs ~100 cores to feed batch 128).
With ``device_augs: true`` the loader stops at cheap geometry (JPEG decode +
one context crop per image, uint8) and everything hot moves into the jitted
train step, batched over the MXU/VPU:

  * BBoxCropWithOffsets twin — random scale/shift crop window + affine
    resample (``crop_resize_mm`` with the warpAffine grid) + the same
    int-truncating bbox transform (ref: aug.py:52-142);
  * paired color jitter across the (template, search[, aux]) group and
    independent photometric noise/blur/downscale per crop, with the
    reference pipelines' probabilities and comparable magnitudes
    (distribution-level parity — the reference never pins aug RNG either);
  * ImageNet normalization;
  * label encoding (box-coder reg/cls maps + Manhattan regression weights),
    presence-gated to zero maps exactly like siam_dataset.py:49-52.

Staged batch layout (produced by SiameseTrackingDataset in staged mode):
  STAGED_SEARCH  (B, 2s, 2s, 3) uint8 — the doubled-context search crop
  STAGED_SEARCH_BBOX (B, 4) f32      — object bbox inside the staged crop
  template/aux images: final geometry, uint8 (photometric augs still apply)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from feartracker_tpu.core import box_coder as bc
from feartracker_tpu.ops.crop import crop_resize_mm, normalize_imagenet
from feartracker_tpu.utils import constants as C

STAGED_SEARCH_KEY = "STAGED_SEARCH"
STAGED_SEARCH_BBOX_KEY = "STAGED_SEARCH_BBOX"


class DeviceAugConfig(NamedTuple):
    search_size: int = 256
    scale: float = 0.2  # sizes.search_image_scale
    shift: float = 32.0  # sizes.search_image_shift
    grid_size: int = 16  # regression weight / score map size
    total_stride: int = 16
    # reference pipeline probabilities (aug.py:8-49)
    p_color: float = 0.5
    p_gray: float = 0.05
    p_blur: float = 0.2
    p_noise: float = 0.2
    p_downscale: float = 0.2


# -- BBoxCropWithOffsets twin -------------------------------------------------


def _modified_crop(key, cfg: DeviceAugConfig, staged_size: int) -> jnp.ndarray:
    """Random scale/shift of the centered s×s window inside the (2s)² staged
    crop (ref: aug.py:90-104 / augmentations.py:407-419)."""
    s = jnp.float32(cfg.search_size)
    x = y = jnp.float32(staged_size) / 2 - s / 2
    ks = jax.random.split(key, 4)
    scale_x = jax.random.uniform(ks[0], minval=-cfg.scale, maxval=cfg.scale)
    scale_y = jax.random.uniform(ks[1], minval=-cfg.scale, maxval=cfg.scale)
    shift_x = jax.random.uniform(ks[2], minval=-cfg.shift, maxval=cfg.shift)
    shift_y = jax.random.uniform(ks[3], minval=-cfg.shift, maxval=cfg.shift)
    new_x = jnp.maximum(0.0, x - scale_x * s / 2 + shift_x)
    new_y = jnp.maximum(0.0, y - scale_y * s / 2 + shift_y)
    new_w = jnp.minimum(jnp.float32(staged_size), new_x + s + scale_x * s) - new_x
    new_h = jnp.minimum(jnp.float32(staged_size), new_y + s + scale_y * s) - new_y
    return jnp.stack([new_x, new_y, new_w, new_h])


def _transform_bbox(bbox: jnp.ndarray, crop: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bbox into crop coords with the reference's int truncation
    (ref: aug.py:109-125 / augmentations.py:432-445)."""
    cs = jnp.float32(out_size)
    new_x = (bbox[0] - crop[0]) * cs / crop[2]
    new_y = (bbox[1] - crop[1]) * cs / crop[3]
    new_w = bbox[2] * cs / crop[2]
    new_h = bbox[3] * cs / crop[3]
    new_w = jnp.where(new_x < 0, new_w + new_x, new_w)
    new_x = jnp.maximum(new_x, 0.0)
    new_h = jnp.where(new_y < 0, new_h + new_y, new_h)
    new_y = jnp.maximum(new_y, 0.0)
    new_w = jnp.minimum(cs, new_x + new_w) - new_x
    new_h = jnp.minimum(cs, new_y + new_h) - new_y
    out = jnp.stack([new_x, new_y, new_w, new_h])
    return jnp.trunc(out)  # int() cast in the reference truncates toward 0


def _handle_empty(bbox: jnp.ndarray, size: int, min_bbox: float = 3.0) -> jnp.ndarray:
    """Exact twins of ensure_bbox_boundaries + handle_empty_bbox
    (ref: utils/utils.py:60-73, dataset/utils.py:149-152): clip into the
    crop, then enforce a minimum side at the clipped location — the host
    path keeps an out-of-crop box pinned at the border, never recentered."""
    x1 = jnp.clip(bbox[0], 0, size)
    y1 = jnp.clip(bbox[1], 0, size)
    x2 = jnp.clip(bbox[0] + bbox[2], 0, size)
    y2 = jnp.clip(bbox[1] + bbox[3], 0, size)
    w = jnp.maximum(x2 - x1, min_bbox)
    h = jnp.maximum(y2 - y1, min_bbox)
    return jnp.stack([x1, y1, w, h])


# -- photometric / color twins ------------------------------------------------


def _color_jitter(key, imgs, p: float):
    """Paired one-of color transform: identical parameters for every image in
    ``imgs`` (ref PairedCompose, siam_dataset.py:64-67). Covers the
    brightness/contrast/gamma/channel-shift family as linear+exp pixel math."""
    k_apply, k_b, k_c, k_g, k_s = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k_apply, p)
    brightness = jax.random.uniform(k_b, minval=-0.2, maxval=0.2) * 255.0
    contrast = 1.0 + jax.random.uniform(k_c, minval=-0.2, maxval=0.2)
    gamma = 1.0 + jax.random.uniform(k_g, minval=-0.2, maxval=0.2)
    ch_shift = jax.random.uniform(k_s, (3,), minval=-20.0, maxval=20.0)

    def one(img):
        x = img.astype(jnp.float32)
        x = (x - 127.5) * contrast + 127.5 + brightness + ch_shift
        x = jnp.clip(x, 0.0, 255.0)
        x = 255.0 * (x / 255.0) ** gamma
        return jnp.where(apply, x, img.astype(jnp.float32))

    return [one(i) for i in imgs]


def _to_gray(key, imgs, p: float):
    """Paired grayscale (ref ToGray/ToSepia one-of, p=0.05)."""
    apply = jax.random.bernoulli(key, p)
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

    def one(img):
        g = jnp.tensordot(img, w, axes=[[-1], [0]])[..., None]
        return jnp.where(apply, jnp.broadcast_to(g, img.shape), img)

    return [one(i) for i in imgs]


def _gauss_blur(key, img, p: float):
    """3×3 binomial blur (stand-in for the reference's blur one-of, p=0.2)."""
    apply = jax.random.bernoulli(key, p)
    k1 = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    x = img.astype(jnp.float32)
    pad = jnp.pad(x, ((1, 1), (0, 0), (0, 0)), mode="edge")
    x_v = pad[:-2] * k1[0] + pad[1:-1] * k1[1] + pad[2:] * k1[2]
    pad = jnp.pad(x_v, ((0, 0), (1, 1), (0, 0)), mode="edge")
    x_b = pad[:, :-2] * k1[0] + pad[:, 1:-1] * k1[1] + pad[:, 2:] * k1[2]
    return jnp.where(apply, x_b, img.astype(jnp.float32))


def _gauss_noise(key, img, p: float):
    """Additive gaussian noise, var ~ U(10, 35) (ref GaussNoise var_limit)."""
    k_apply, k_var, k_n = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, p)
    sigma = jnp.sqrt(jax.random.uniform(k_var, minval=10.0, maxval=35.0))
    noise = sigma * jax.random.normal(k_n, img.shape, jnp.float32)
    return jnp.where(apply, jnp.clip(img + noise, 0.0, 255.0), img)


def _downscale(key, img, p: float):
    """Downscale to 0.5× and back (ref Downscale(0.5, 0.5), p=0.2)."""
    apply = jax.random.bernoulli(key, p)
    h, w = img.shape[0], img.shape[1]
    small = jax.image.resize(img, (h // 2, w // 2, img.shape[2]), "linear")
    back = jax.image.resize(small, img.shape, "linear")
    return jnp.where(apply, back, img)


def _photometric(key, img, cfg: DeviceAugConfig):
    """Independent per-crop pipeline (ref photometric_augmentations)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = _gauss_blur(k1, img, cfg.p_blur)
    x = _gauss_noise(k2, x, cfg.p_noise)
    x = _downscale(k3, x, cfg.p_downscale)
    return x


# -- the batched entry point --------------------------------------------------


def augment_batch(
    batch: Dict[str, Any], key: jnp.ndarray, cfg: DeviceAugConfig
) -> Dict[str, Any]:
    """Staged uint8 batch → the standard normalized/encoded training batch.

    Jit-friendly (static shapes, pure); call inside the train step with a
    per-step PRNG key.
    """
    staged = batch[STAGED_SEARCH_KEY]
    staged_bbox = batch[STAGED_SEARCH_BBOX_KEY].astype(jnp.float32)
    template = batch[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY]
    aux = batch.get(C.TRACKER_TARGET_AUX_IMAGE_KEY)
    B = staged.shape[0]
    staged_size = staged.shape[1]
    s = cfg.search_size

    keys = jax.random.split(key, B)

    def per_sample(k, img, bbox, tmpl, aux_i):
        k_crop, k_color, k_gray, k_pt, k_ps, k_pa = jax.random.split(k, 6)
        crop_w = _modified_crop(k_crop, cfg, staged_size)
        search = crop_resize_mm(
            img, crop_w, s, jnp.zeros(3, jnp.float32), grid="affine"
        )
        sbox = _handle_empty(_transform_bbox(bbox, crop_w, s), s)

        group = [tmpl, search] + ([aux_i] if aux_i is not None else [])
        group = _to_gray(k_gray, group, cfg.p_gray)
        group = _color_jitter(k_color, group, cfg.p_color)
        tmpl_a = _photometric(k_pt, group[0], cfg)
        search_a = _photometric(k_ps, group[1], cfg)
        aux_a = _photometric(k_pa, group[2], cfg) if aux_i is not None else None
        return search_a, sbox, tmpl_a, aux_a

    if aux is None:
        search_a, sbox, tmpl_a, _ = jax.vmap(
            lambda k, i, b, t: per_sample(k, i, b, t, None)
        )(keys, staged, staged_bbox, template)
        aux_a = None
    else:
        search_a, sbox, tmpl_a, aux_a = jax.vmap(per_sample)(
            keys, staged, staged_bbox, template, aux
        )

    # labels (presence-gated, ref siam_dataset.py:46-62)
    spec = bc.BoxCoderSpec(
        score_size=cfg.grid_size, total_stride=cfg.total_stride, instance_size=s
    )
    enc = bc.encode(sbox, spec)
    weight = regression_weight_batch(sbox, s, cfg.grid_size)
    presence = batch[C.TARGET_VISIBILITY_KEY].astype(jnp.float32).reshape(B, 1, 1, 1)
    out = dict(batch)
    out.pop(STAGED_SEARCH_KEY)
    out.pop(STAGED_SEARCH_BBOX_KEY)
    out[C.TRACKER_TARGET_SEARCH_IMAGE_KEY] = normalize_imagenet(search_a)
    out[C.TRACKER_TARGET_TEMPLATE_IMAGE_KEY] = normalize_imagenet(tmpl_a)
    if aux_a is not None:
        out[C.TRACKER_TARGET_AUX_IMAGE_KEY] = normalize_imagenet(aux_a)
    out[C.TRACKER_TARGET_BBOX_KEY] = sbox
    out[C.TARGET_REGRESSION_LABEL_KEY] = enc.regression_map * presence
    out[C.TARGET_CLASSIFICATION_KEY] = enc.classification_label * presence
    out[C.TARGET_REGRESSION_WEIGHT_KEY] = weight * presence[:, :, :, 0]
    return out


def regression_weight_batch(bboxes: jnp.ndarray, image_size: int, map_size: int,
                            r_pos: int = 2, r_neg: int = 0) -> jnp.ndarray:
    """Batched device twin of data/labels.get_regression_weight_label
    (ref: dataset/utils.py:19-32)."""
    cx = bboxes[:, 0] + jnp.floor(bboxes[:, 2] / 2)  # host uses // on ints
    cy = bboxes[:, 1] + jnp.floor(bboxes[:, 3] / 2)
    sx = jnp.floor(cx / image_size * map_size)[:, None, None]
    sy = jnp.floor(cy / image_size * map_size)[:, None, None]
    r = jnp.arange(map_size, dtype=jnp.float32)
    x = r[None, None, :] - sx
    y = r[None, :, None] - sy
    dist = jnp.abs(x) + jnp.abs(y)
    return jnp.where(dist <= r_pos, 1.0, jnp.where(dist < r_neg, 0.5, 0.0)).astype(jnp.float32)
