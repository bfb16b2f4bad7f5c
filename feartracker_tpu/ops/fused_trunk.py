"""Inference-folded FBNet trunk with a fused-block fast path.

The scan tracker's device profile (BENCHMARKS.md "Op-level device profile")
shows ~93% of step time in trunk conv fusions, and the roofline analysis pins
the bottleneck on HBM traffic — dominated by the inverted-residual blocks'
*expanded* intermediates (6·C channels) round-tripping HBM between the
expand / depthwise / project convolutions, which XLA cannot fuse into each
other. This module removes those round-trips:

  * :func:`fold_fear_net` folds every ``conv → BN`` pair of the trunk + neck
    into plain ``(w, b)`` inference weights (exact at eval time — BN running
    stats are affine).
  * :func:`trunk_forward` runs the trunk from folded weights, dispatching
    each block either to the fused Pallas kernel
    (:mod:`feartracker_tpu.ops.pallas.ir_block` — expand→depthwise→project in
    one VMEM-resident kernel) or to a plain-lax fallback
    (:func:`xla_ir_block`) when the block shape is not kernel-eligible.

The reference has no analog: its trunk ran as eager torch/cuDNN convs
(ref: model_training/model/blocks.py:8-42); this is the TPU-native
"hand-tuned mobile inference path" obligation from SURVEY.md §2.4.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from feartracker_tpu.models.fbnet import IRBlockSpec

_BN_EPS = 1e-5  # matches models.blocks.ConvBNAct


def _fold_conv_bn(conv: Dict[str, Any], bn: Dict[str, Any], stats: Dict[str, Any]):
    """conv (no bias) → BN(running stats) ≡ conv(w·s) + (β − μ·s), s = γ/√(σ²+ε)."""
    w = jnp.asarray(conv["kernel"], jnp.float32)
    s = jnp.asarray(bn["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(stats["var"], jnp.float32) + _BN_EPS
    )
    b = jnp.asarray(bn["bias"], jnp.float32) - jnp.asarray(stats["mean"], jnp.float32) * s
    return w * s, b


def fold_fear_net(variables: Dict[str, Any], trunk_blocks: Sequence[IRBlockSpec]) -> Dict[str, Any]:
    """Fold the FEARNet encoder + neck into inference weights.

    Returns a pytree of f32 arrays:
      ``stem``: {"w": (3,3,3,C), "b": (C,)}
      ``blocks``: list; each {"expand": {"w": (Cin,Ce), "b": (Ce,)} | None,
                  "dw": {"w": (k,k,C), "b": (C,)},
                  "project": {"w": (Ce,Cout), "b": (Cout,)}}
      ``neck``: {"w": (C,256), "b": (256,)}
    """
    p = variables["params"]["encoder"]
    st = variables["batch_stats"]["encoder"]
    sw, sb = _fold_conv_bn(p["stem"]["conv"], p["stem"]["bn"], st["stem"]["bn"])
    blocks: List[Dict[str, Any]] = []
    for i, spec in enumerate(trunk_blocks):
        bp, bs = p[f"block{i}"], st[f"block{i}"]
        blk: Dict[str, Any] = {}
        if "expand" in bp:
            ew, eb = _fold_conv_bn(bp["expand"]["conv"], bp["expand"]["bn"], bs["expand"]["bn"])
            blk["expand"] = {"w": ew.reshape(ew.shape[2], ew.shape[3]), "b": eb}
            if spec.stride == 2:
                # pre-pack the block-diagonal expand weights for the Pallas
                # kernel's parity-packed input (packing inside the tracking
                # scan would re-run every frame)
                from feartracker_tpu.ops.pallas.ir_block import pack_expand_weights

                w4, b4 = pack_expand_weights(blk["expand"]["w"], blk["expand"]["b"])
                blk["expand"].update(w4=w4, b4=b4)
        else:
            blk["expand"] = None
        dw, db = _fold_conv_bn(bp["dw"]["conv"], bp["dw"]["bn"], bs["dw"]["bn"])
        blk["dw"] = {"w": dw.reshape(dw.shape[0], dw.shape[1], dw.shape[3]), "b": db}
        pw, pb = _fold_conv_bn(bp["project"]["conv"], bp["project"]["bn"], bs["project"]["bn"])
        blk["project"] = {"w": pw.reshape(pw.shape[2], pw.shape[3]), "b": pb}
        blocks.append(blk)
    np_, ns = variables["params"]["neck"], variables["batch_stats"]["neck"]
    nw, nb = _fold_conv_bn(
        np_["downsample"]["conv"], np_["downsample"]["bn"], ns["downsample"]["bn"]
    )
    return {
        "stem": {"w": sw, "b": sb},
        "blocks": blocks,
        "neck": {"w": nw.reshape(nw.shape[2], nw.shape[3]), "b": nb},
    }


def _matmul_channels(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def xla_ir_block(x: jnp.ndarray, blk: Dict[str, Any], spec: IRBlockSpec) -> jnp.ndarray:
    """Folded-weights inverted-residual block as plain lax ops (fallback path;
    numerically ≡ the Flax eval-mode block up to float association)."""
    k, s, p = spec.kernel, spec.stride, spec.kernel // 2
    inp = x
    if blk["expand"] is not None:
        x = jax.nn.relu(_matmul_channels(x, blk["expand"]["w"], blk["expand"]["b"]))
    ce = x.shape[-1]
    dw = blk["dw"]["w"].reshape(k, k, 1, ce).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, dw, window_strides=(s, s), padding=((p, p), (p, p)),
        feature_group_count=ce,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    x = jax.nn.relu(x + blk["dw"]["b"]).astype(inp.dtype)
    x = _matmul_channels(x, blk["project"]["w"], blk["project"]["b"])
    if s == 1 and inp.shape[-1] == x.shape[-1]:
        x = x + inp
    return x


def fused_eligible(spec: IRBlockSpec, shape: Tuple[int, ...], dtype) -> bool:
    """Kernel eligibility: expansion > 1 (e=1 blocks have no expanded
    intermediate worth fusing), widths that reshape cleanly in Mosaic
    (second-minor dims multiples of the sublane tile), and a block that fits
    the scoped-VMEM budget at some stream tile."""
    if spec.expansion <= 1:
        return False
    S, H, W, Cin = shape
    from feartracker_tpu.ops.pallas.ir_block import sublane_tile

    sub = sublane_tile(dtype)
    if H % spec.stride or W % spec.stride:
        return False
    win = W // 2 if spec.stride == 2 else W
    wout = W // spec.stride
    if not (win % sub == 0 and wout % sub == 0 and H >= spec.stride * 2):
        return False
    from feartracker_tpu.ops.pallas.ir_block import pick_s_tile

    return (
        pick_s_tile(
            S, H, W, Cin, Cin * spec.expansion, spec.out_channels,
            spec.kernel, spec.stride, dtype,
        )
        > 0
    )


def trunk_forward(
    x: jnp.ndarray,
    folded: Dict[str, Any],
    specs: Sequence[IRBlockSpec],
    impl: str = "fused",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Folded-weights trunk forward. ``impl``: "fused" dispatches eligible
    blocks to the Pallas kernel; "xla" runs everything on the fallback path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stem = folded["stem"]
    cdtype = x.dtype
    x = jax.lax.conv_general_dilated(
        x, stem["w"].astype(cdtype), window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    x = jax.nn.relu(x + stem["b"]).astype(cdtype)
    for spec, blk in zip(specs, folded["blocks"]):
        if impl == "fused" and fused_eligible(spec, x.shape, x.dtype):
            from feartracker_tpu.ops.pallas.ir_block import fused_ir_block

            x = fused_ir_block(x, blk, spec, interpret=interpret)
        else:
            x = xla_ir_block(x, blk, spec)
    return x


def get_features_folded(
    x: jnp.ndarray,
    folded: Dict[str, Any],
    specs: Sequence[IRBlockSpec],
    impl: str = "fused",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Folded trunk + neck — inference equivalent of FEARNet.get_features."""
    t = trunk_forward(x, folded, specs, impl=impl, interpret=interpret)
    return _matmul_channels(t, folded["neck"]["w"], folded["neck"]["b"])
