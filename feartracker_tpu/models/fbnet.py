"""FBNet-style backbone (Flax linen, NHWC).

The reference builds its encoder from ``mobile_cv``'s pretrained FBNet-C and
runs stages[:4] → 112 channels (ref: model_training/model/blocks.py:8-42,
fear_net.py:58-61, config/model/fear.yaml:16). ``mobile_cv`` is not available
here — instead the exact trained FEAR-XS trunk was recovered from the CoreML
export (evaluate/FEARDemo/FEARDemo/TrackerInit.mlmodel): a 3×3/s2 stem to 16
channels followed by 16 inverted-residual blocks. ``FEAR_XS_TRUNK`` below is
that recovered architecture, block for block.

Blocks follow the MobileNetV2 inverted-residual pattern: optional 1×1 expand
(+BN+ReLU) → k×k depthwise (+BN+ReLU) → 1×1 linear project (+BN), residual
when stride 1 and channels match.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from feartracker_tpu.models.blocks import ConvBNAct


class IRBlockSpec(NamedTuple):
    expansion: int
    kernel: int
    stride: int
    out_channels: int


# Recovered from TrackerInit.mlmodel (see module docstring). Stage boundaries
# (for feature-pyramid use) are marked by stride-2 blocks.
FEAR_XS_TRUNK: Tuple[IRBlockSpec, ...] = (
    IRBlockSpec(1, 3, 1, 16),
    IRBlockSpec(6, 3, 2, 24),
    IRBlockSpec(1, 3, 1, 24),
    IRBlockSpec(1, 3, 1, 24),
    IRBlockSpec(6, 5, 2, 32),
    IRBlockSpec(3, 5, 1, 32),
    IRBlockSpec(6, 5, 1, 32),
    IRBlockSpec(6, 3, 1, 32),
    IRBlockSpec(6, 5, 2, 64),
    IRBlockSpec(3, 5, 1, 64),
    IRBlockSpec(6, 5, 1, 64),
    IRBlockSpec(6, 5, 1, 64),
    IRBlockSpec(6, 5, 1, 112),
    IRBlockSpec(6, 5, 1, 112),
    IRBlockSpec(6, 5, 1, 112),
    IRBlockSpec(3, 5, 1, 112),
)


# A 3-block stride-8 trunk for smoke tests / CI (compiles in seconds).
TINY_TRUNK: Tuple[IRBlockSpec, ...] = (
    IRBlockSpec(1, 3, 1, 8),
    IRBlockSpec(2, 3, 2, 12),
    IRBlockSpec(2, 5, 2, 16),
)


# Scaled family variants. The reference ships only FEAR-XS (its paper names
# FEAR-M/FEAR-L with heavier backbones but the repo releases neither weights
# nor specs — ref: README.md:28 "The FEAR-XS model checkpoint is available").
# These are framework-native scale-ups in the same FBNet inverted-residual
# design space: identical output stride 16 and head geometry (score 16×16,
# template feats 8×8 after the neck), so every downstream component —
# ScanTracker, StreamPool, training, export — is drop-in; only width/depth
# (and hence MACs/params) grow. See BENCHMARKS.md "Model family".
FEAR_M_TRUNK: Tuple[IRBlockSpec, ...] = (
    IRBlockSpec(1, 3, 1, 24),
    IRBlockSpec(6, 3, 2, 36),
    IRBlockSpec(3, 3, 1, 36),
    IRBlockSpec(3, 3, 1, 36),
    IRBlockSpec(6, 5, 2, 48),
    IRBlockSpec(3, 5, 1, 48),
    IRBlockSpec(6, 5, 1, 48),
    IRBlockSpec(6, 3, 1, 48),
    IRBlockSpec(6, 5, 2, 96),
    IRBlockSpec(3, 5, 1, 96),
    IRBlockSpec(6, 5, 1, 96),
    IRBlockSpec(6, 5, 1, 96),
    IRBlockSpec(6, 5, 1, 96),
    IRBlockSpec(6, 5, 1, 168),
    IRBlockSpec(6, 5, 1, 168),
    IRBlockSpec(6, 5, 1, 168),
    IRBlockSpec(3, 5, 1, 168),
)

FEAR_L_TRUNK: Tuple[IRBlockSpec, ...] = (
    IRBlockSpec(1, 3, 1, 32),
    IRBlockSpec(6, 3, 2, 48),
    IRBlockSpec(3, 3, 1, 48),
    IRBlockSpec(3, 3, 1, 48),
    IRBlockSpec(6, 5, 2, 64),
    IRBlockSpec(6, 5, 1, 64),
    IRBlockSpec(6, 5, 1, 64),
    IRBlockSpec(6, 3, 1, 64),
    IRBlockSpec(6, 5, 2, 128),
    IRBlockSpec(6, 5, 1, 128),
    IRBlockSpec(6, 5, 1, 128),
    IRBlockSpec(6, 5, 1, 128),
    IRBlockSpec(6, 5, 1, 128),
    IRBlockSpec(6, 5, 1, 128),
    IRBlockSpec(6, 5, 1, 224),
    IRBlockSpec(6, 5, 1, 224),
    IRBlockSpec(6, 5, 1, 224),
    IRBlockSpec(3, 5, 1, 224),
)

TRUNKS = {
    "fear_xs": FEAR_XS_TRUNK,
    "fear_tiny": TINY_TRUNK,
    "fear_m": FEAR_M_TRUNK,
    "fear_l": FEAR_L_TRUNK,
}


class InvertedResidual(nn.Module):
    spec: IRBlockSpec
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        inp = x
        in_ch = x.shape[-1]
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        if s.expansion != 1:
            x = ConvBNAct(in_ch * s.expansion, kernel=1, name="expand", **kw)(x, train)
        x = ConvBNAct(
            x.shape[-1],
            kernel=s.kernel,
            stride=s.stride,
            padding=s.kernel // 2,
            groups=x.shape[-1],
            name="dw",
            **kw,
        )(x, train)
        x = ConvBNAct(s.out_channels, kernel=1, relu=False, name="project", **kw)(x, train)
        if s.stride == 1 and in_ch == s.out_channels:
            x = x + inp
        return x


class FBNetTrunk(nn.Module):
    """Stem + inverted-residual trunk. ``blocks`` defaults to the recovered
    FEAR-XS trunk (output stride 16, 112 channels)."""

    blocks: Sequence[IRBlockSpec] = FEAR_XS_TRUNK
    stem_channels: int = 16
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = ConvBNAct(
            self.stem_channels, kernel=3, stride=2, padding=1, name="stem", **kw
        )(x, train)
        for i, spec in enumerate(self.blocks):
            x = InvertedResidual(spec, name=f"block{i}", **kw)(x, train)
        return x
