"""Model building blocks (Flax linen, NHWC).

TPU-first re-design of the reference blocks
(ref: model_training/model/blocks.py): same computation graph, but NHWC
layout, explicit torch-style symmetric padding (so weights recovered from the
CoreML export reproduce the reference numerics exactly — XLA 'SAME' pads
asymmetrically for stride 2 and would not), and the pixel-wise correlation
expressed as an einsum that XLA maps onto the MXU.

BatchNorm placement mirrors the reference training graph; at inference the
CoreML importer loads folded conv+bias and sets BN to identity
(see feartracker_tpu/convert/fear_weights.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _pad(p: int):
    return ((p, p), (p, p))


class SepConv(nn.Module):
    """Depthwise k×k + pointwise 1×1 (ref: blocks.py:45-72)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_pad(self.padding),
            feature_group_count=in_ch,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="dw",
        )(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="pw")(x)
        return x


class ConvBNAct(nn.Module):
    """conv → BN → (optional) ReLU. ``axis_name`` enables cross-replica
    (sync) BatchNorm, the ICI equivalent of the reference's ``sync_bn``
    (config/backend/2gpu.yaml:5)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_pad(self.padding),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class AdjustLayer(nn.Module):
    """Neck: 1×1 conv + BN, no activation (ref: blocks.py:75-88)."""

    features: int = 256
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNAct(
            self.features, kernel=1, relu=False, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="downsample",
        )(x, train)


class SepConvBNReLU(nn.Module):
    """SepConv → BN → ReLU, the repeated unit of the encode/corr/tower stacks
    (ref: blocks.py:98-102,115-119,152-161)."""

    features: int
    kernel: int = 3
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SepConv(
            self.features, kernel=self.kernel, padding=self.padding,
            use_bias=self.use_bias, dtype=self.dtype, name="sep",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="bn",
        )(x)
        return nn.relu(x)


def flatten_template(z: jnp.ndarray) -> jnp.ndarray:
    """Template features (B, Ht, Wt, C) → (B, Ht·Wt, C), row-major over
    (h, w) — the NHWC analog of ``z.reshape(B, C, -1)`` + transpose
    (ref: blocks.py:104-105,123)."""
    B, H, W, C = z.shape
    return z.reshape(B, H * W, C)


def pixelwise_correlation(z_flat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """FEAR's signature correlation volume: every template position dotted
    with every search position over channels (ref: blocks.py:121-123
    ``matmul(zᵀ, x)``).

    Args:
      z_flat: (B, Kt, C) flattened template features (Kt = Ht·Wt, 64).
      x: (B, H, W, C) encoded search features.
    Returns:
      (B, H, W, Kt) correlation volume — channel k corresponds to template
      cell k in row-major order, matching the torch channel order after the
      reference's ``.view(b, -1, w, h)``.
    """
    out = jnp.einsum("bkc,bhwc->bhwk", z_flat, x, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


class MobileCorrelation(nn.Module):
    """Correlation volume concat + SepConv re-encode (ref: blocks.py:108-126)."""

    features: int = 256
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z_flat, x, train: bool = False):
        s = pixelwise_correlation(z_flat, x)
        s = jnp.concatenate([x, s], axis=-1)  # (B,H,W,C+Kt); x first, as torch.cat
        return SepConvBNReLU(
            self.features, use_bias=True, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="enc",
        )(s, train)


class BoxTower(nn.Module):
    """Dual-branch (cls/reg) correlation head (ref: blocks.py:129-194).

    ``update`` is the dual-template hook: when provided, the classification
    branch correlates against the updated template while regression keeps the
    static one (ref: blocks.py:174-181).
    """

    features: int = 256
    towernum: int = 2
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, search, kernel, update=None, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        cls_kernel = kernel if update is None else update
        cls_z = flatten_template(cls_kernel)
        reg_z = flatten_template(kernel)
        # MatrixMobile: template passes through as-is; search is re-encoded
        # (ref: blocks.py:91-105; SepConv there has bias=False)
        cls_x = SepConvBNReLU(self.features, use_bias=False, name="cls_encode", **kw)(search, train)
        reg_x = SepConvBNReLU(self.features, use_bias=False, name="reg_encode", **kw)(search, train)

        cls_dw = MobileCorrelation(self.features, name="cls_dw", **kw)(cls_z, cls_x, train)
        reg_dw = MobileCorrelation(self.features, name="reg_dw", **kw)(reg_z, reg_x, train)

        x_reg = reg_dw
        for i in range(self.towernum):
            x_reg = SepConvBNReLU(self.features, name=f"bbox_tower{i}", **kw)(x_reg, train)
        c = cls_dw
        for i in range(self.towernum):
            c = SepConvBNReLU(self.features, name=f"cls_tower{i}", **kw)(c, train)

        # reg head: bbox = exp(adjust · pred + bias) (ref: blocks.py:167-172,185-188)
        pred = SepConv(4, kernel=3, padding=1, dtype=self.dtype, name="bbox_pred")(x_reg)
        adjust = self.param("adjust", lambda k: jnp.full((1,), 0.1, jnp.float32))
        bias = self.param("bias", lambda k: jnp.ones((1, 1, 1, 4), jnp.float32))
        bbox = jnp.exp(adjust.astype(pred.dtype) * pred + bias.astype(pred.dtype))

        # cls head: 0.1 · pred (ref: blocks.py:168,191-192); the 0.1 is kept
        # learnable so the CoreML importer (which receives it folded into the
        # conv) can set it to 1.0.
        cls_pred = SepConv(1, kernel=3, padding=1, dtype=self.dtype, name="cls_pred")(c)
        cls_scale = self.param("cls_scale", lambda k: jnp.full((1,), 0.1, jnp.float32))
        cls = cls_scale.astype(cls_pred.dtype) * cls_pred

        return bbox, cls, cls_dw, x_reg
