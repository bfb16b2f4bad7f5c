"""Test oracle: directly interpret a parsed CoreML graph with torch CPU ops.

This is schema-driven (walks the Layer records from
feartracker_tpu.convert.coreml), not FEAR-specific — it gives an independent
numerical reference for the recovered weights, against which the Flax model
is checked. Test-only; never imported by the package.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import torch
import torch.nn.functional as F

from feartracker_tpu.convert.coreml import Layer


def run_graph(layers, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute layers sequentially. inputs/outputs are NCHW float32 numpy."""
    env: Dict[str, torch.Tensor] = {
        k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in inputs.items()
    }
    for layer in layers:
        x = env[layer.inputs[0]]
        if layer.kind == "conv":
            c = layer.conv
            w = torch.from_numpy(c.weights.astype(np.float32))
            b = torch.from_numpy(c.bias.astype(np.float32)) if c.bias is not None else None
            t, bt, l, r = c.pad
            xp = F.pad(x, (l, r, t, bt))
            out = F.conv2d(xp, w, b, stride=c.stride, dilation=c.dilation, groups=c.groups)
        elif layer.kind == "relu":
            out = F.relu(x)
        elif layer.kind == "add":
            out = x + env[layer.inputs[1]]
        elif layer.kind == "concat":
            out = torch.cat([env[n] for n in layer.inputs], dim=1)
        elif layer.kind == "scale":
            scale = torch.from_numpy(np.asarray(layer.attrs["scale"], np.float32))
            shape = list(layer.attrs["shape_scale"])
            out = x * scale.reshape(1, *shape)
        elif layer.kind == "unary":
            assert layer.attrs.get("type") == 4, layer.attrs  # EXP
            alpha = layer.attrs.get("alpha", 1.0)
            scale = layer.attrs.get("scale", 1.0)
            shift = layer.attrs.get("shift", 0.0)
            out = torch.exp(alpha * (scale * x + shift))
        elif layer.kind == "reshape":
            out = x.reshape(layer.attrs["target_shape"])
        elif layer.kind == "transpose":
            out = x.permute(*layer.attrs["axes"])
        elif layer.kind == "batched_matmul":
            out = torch.matmul(x, env[layer.inputs[1]])
        else:
            raise NotImplementedError(layer.kind)
        env[layer.outputs[0]] = out
    return {k: v.numpy() for k, v in env.items()}
