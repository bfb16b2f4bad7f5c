"""Map CoreML-recovered FEAR-XS weights onto the Flax FEARNet parameter tree.

The CoreML export (ref: evaluate/coreml_convert.py:13-57) stores BN-folded
convs, so every conv here receives (kernel, bias) and every BatchNorm is set
to an exact identity (scale=1, bias=0, mean=0, var=1−eps so that
sqrt(var+eps)==1). The reference's learnable output affines were folded too:
``exp(adjust·x+bias)`` (blocks.py:187-188) → adjust:=1, bias:=0; the constant
``0.1·cls`` (blocks.py:192) → cls_scale:=1.

Conv ordering inside the .mlmodel files is the torch trace order; the mapping
below walks it structurally and asserts every shape, so any mismatch fails
loudly instead of silently mis-assigning weights.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from feartracker_tpu.convert.coreml import ConvParams, conv_layers, parse_mlmodel
from feartracker_tpu.models.fbnet import FEAR_XS_TRUNK

BN_EPS = 1e-5


def _kernel_hwio(c: ConvParams) -> np.ndarray:
    """torch OIHW → flax HWIO (works for depthwise too: (C,1,kh,kw)→(kh,kw,1,C))."""
    return np.ascontiguousarray(c.weights.transpose(2, 3, 1, 0)).astype(np.float32)


def _identity_bn(channels: int) -> Dict[str, Dict[str, np.ndarray]]:
    return {
        "params": {
            "scale": np.ones((channels,), np.float32),
            "bias": np.zeros((channels,), np.float32),
        },
        "stats": {
            "mean": np.zeros((channels,), np.float32),
            "var": np.full((channels,), 1.0 - BN_EPS, np.float32),
        },
    }


class _ConvStream:
    def __init__(self, convs: List[ConvParams]):
        self.convs = convs
        self.idx = 0

    def take(self, out_channels: int, kernel: int, groups: int = 1) -> ConvParams:
        if self.idx >= len(self.convs):
            raise ValueError(
                f"graph exhausted after {self.idx} convs — wrong .mlmodel for this "
                f"loader? (expected the full Tracker graph, not TrackerInit)"
            )
        c = self.convs[self.idx]
        if (c.out_channels, c.kernel_size[0], c.groups) != (out_channels, kernel, groups):
            raise ValueError(
                f"conv #{self.idx}: expected (out={out_channels}, k={kernel}, g={groups}), "
                f"got (out={c.out_channels}, k={c.kernel_size[0]}, g={c.groups})"
            )
        self.idx += 1
        return c


def _conv_bn(stream: _ConvStream, out: int, kernel: int, groups: int = 1):
    """One ConvBNAct: folded conv + identity BN. The model's trunk convs are
    bias-less (conv+BN, as the reference backbone), so the exporter's folded
    bias rides on the identity-BN's beta — numerically identical."""
    c = stream.take(out, kernel, groups)
    bn = _identity_bn(out)
    if c.bias is not None:
        bn["params"]["bias"] = c.bias.astype(np.float32)
    params = {"conv": {"kernel": _kernel_hwio(c)}, "bn": bn["params"]}
    stats = {"bn": bn["stats"]}
    return params, stats


def _sep_conv(stream: _ConvStream, in_ch: int, out: int, kernel: int = 3):
    dw = stream.take(in_ch, kernel, groups=in_ch)
    pw = stream.take(out, 1, groups=1)
    params = {"dw": {"kernel": _kernel_hwio(dw)}, "pw": {"kernel": _kernel_hwio(pw)}}
    if dw.bias is not None:
        params["dw"]["bias"] = dw.bias.astype(np.float32)
    if pw.bias is not None:
        params["pw"]["bias"] = pw.bias.astype(np.float32)
    return params


def _sep_bn_relu(stream: _ConvStream, in_ch: int, out: int, kernel: int = 3, use_bias: bool = True):
    """SepConv+BN+ReLU. When the reference SepConv had ``bias=False``
    (MatrixMobile, blocks.py:98-99), the exporter still folded BN into the
    pointwise conv's bias — here the conv has no bias param, so that folded
    bias is carried by the identity-BN's beta instead (exactly equivalent)."""
    sep = _sep_conv(stream, in_ch, out, kernel)
    bn = _identity_bn(out)
    if not use_bias:
        pw_bias = sep["pw"].pop("bias", None)
        sep["dw"].pop("bias", None)
        if pw_bias is not None:
            bn["params"]["bias"] = pw_bias
    return {"sep": sep, "bn": bn["params"]}, {"bn": bn["stats"]}


def _trunk_and_neck(stream: _ConvStream, adjust_channels: int = 256):
    enc_params: Dict[str, dict] = {}
    enc_stats: Dict[str, dict] = {}
    p, s = _conv_bn(stream, 16, 3)
    enc_params["stem"], enc_stats["stem"] = p, s

    in_ch = 16
    for i, spec in enumerate(FEAR_XS_TRUNK):
        bp: Dict[str, dict] = {}
        bs: Dict[str, dict] = {}
        ch = in_ch
        if spec.expansion != 1:
            ch = in_ch * spec.expansion
            bp["expand"], bs["expand"] = _conv_bn(stream, ch, 1)
        bp["dw"], bs["dw"] = _conv_bn(stream, ch, spec.kernel, groups=ch)
        bp["project"], bs["project"] = _conv_bn(stream, spec.out_channels, 1)
        enc_params[f"block{i}"], enc_stats[f"block{i}"] = bp, bs
        in_ch = spec.out_channels

    np_, ns = _conv_bn(stream, adjust_channels, 1)
    neck_params = {"downsample": np_}
    neck_stats = {"downsample": ns}
    return enc_params, enc_stats, neck_params, neck_stats


def load_fear_xs(
    tracker_path: str,
    channels: int = 256,
    towernum: int = 2,
) -> Dict[str, dict]:
    """Build FEARNet variables from the Tracker .mlmodel (which contains the
    full trunk + neck + head).

    Returns a dict with 'params' and 'batch_stats' collections ready for
    ``model.apply({'params': ..., 'batch_stats': ...}, ...)``.
    """
    tracker = parse_mlmodel(tracker_path)
    stream = _ConvStream([l.conv for l in conv_layers(tracker["layers"])])

    enc_p, enc_s, neck_p, neck_s = _trunk_and_neck(stream, channels)

    head_p: Dict[str, dict] = {}
    head_s: Dict[str, dict] = {}
    corr_ch = channels + 64  # correlation volume adds Ht·Wt = 64 channels
    for name in ("cls_encode", "reg_encode"):
        head_p[name], head_s[name] = _sep_bn_relu(stream, channels, channels, use_bias=False)
    for name in ("cls_dw", "reg_dw"):
        p, s = _sep_bn_relu(stream, corr_ch, channels)
        head_p[name], head_s[name] = {"enc": p}, {"enc": s}
    for i in range(towernum):
        head_p[f"bbox_tower{i}"], head_s[f"bbox_tower{i}"] = _sep_bn_relu(stream, channels, channels)
    head_p["bbox_pred"] = _sep_conv(stream, channels, 4)
    for i in range(towernum):
        head_p[f"cls_tower{i}"], head_s[f"cls_tower{i}"] = _sep_bn_relu(stream, channels, channels)
    head_p["cls_pred"] = _sep_conv(stream, channels, 1)

    if stream.idx != len(stream.convs):
        raise ValueError(f"unconsumed convs: {stream.idx} of {len(stream.convs)}")

    # output affines were folded into the convs by the exporter
    head_p["adjust"] = np.ones((1,), np.float32)
    head_p["bias"] = np.zeros((1, 1, 1, 4), np.float32)
    head_p["cls_scale"] = np.ones((1,), np.float32)

    params = {
        "encoder": enc_p,
        "neck": neck_p,
        "connect_model": head_p,
        "template_gate": np.zeros((1,), np.float32),
    }
    stats = {"encoder": enc_s, "neck": neck_s, "connect_model": head_s}
    return {"params": params, "batch_stats": stats}


def imagenet_preprocess(image_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC [0,255] → normalized float32, identical to the
    reference's albumentations Normalize (base_tracker.py:69-81) and to the
    CoreML ImageScaler + scale_layer pair (coreml_utils.py:61-135)."""
    from feartracker_tpu.utils.image import normalize_imagenet_np

    return normalize_imagenet_np(image_u8)
