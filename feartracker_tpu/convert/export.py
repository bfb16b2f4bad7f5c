"""Deployment export: the TPU analog of the reference's CoreML conversion.

The reference deploys two graphs — ``TrackerInit`` (template crop → features)
and ``Tracker`` (search crop + features → bbox, cls) — FP16-quantized
(ref: evaluate/coreml_convert.py:13-57, coreml_utils.py:54-58, consumed at
VOTracker.swift:44-55). Here the same two-graph split is exported as
serialized StableHLO via ``jax.export`` — a self-contained, weights-embedded
artifact loadable without the model source — with an optional bfloat16
compute variant standing in for the FP16 quantization.

Image normalization is baked into both graphs (inputs are raw [0,255] RGB
float), exactly as the CoreML export injected its scale preprocessing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.utils.constants import (
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
)


from feartracker_tpu.ops.crop import normalize_imagenet as _normalize


def export_tracker(
    model: FEARNet,
    variables: Dict[str, Any],
    out_dir: str,
    template_size: int = 128,
    instance_size: int = 256,
    feat_size: int = 8,
    channels: int = 256,
    quantize: bool = True,
) -> Dict[str, str]:
    """Write ``tracker_init.stablehlo`` + ``tracker.stablehlo`` (and
    ``*_quantized.stablehlo`` bf16 variants when ``quantize``)."""
    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}

    def make_graphs(dtype):
        cast = (lambda t: jax.tree.map(lambda a: a.astype(dtype) if hasattr(a, "astype") and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, t))
        use_vars = cast(variables) if dtype == jnp.bfloat16 else variables

        def init_fn(image):
            x = _normalize(image).astype(dtype)
            return model.apply(use_vars, x, method=model.get_features).astype(jnp.float32)

        def track_fn(image, feats):
            x = _normalize(image).astype(dtype)
            out = model.apply(use_vars, x, feats.astype(dtype), method=model.track)
            return (
                out[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
                out[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
            )

        return init_fn, track_fn

    template = jnp.zeros((1, template_size, template_size, 3), jnp.float32)
    search = jnp.zeros((1, instance_size, instance_size, 3), jnp.float32)
    feats = jnp.zeros((1, feat_size, feat_size, channels), jnp.float32)

    variants = [("", jnp.float32)]
    if quantize:
        variants.append(("_quantized", jnp.bfloat16))
    for suffix, dtype in variants:
        init_fn, track_fn = make_graphs(dtype)
        exp_init = jax.export.export(jax.jit(init_fn))(template)
        exp_track = jax.export.export(jax.jit(track_fn))(search, feats)
        p1 = os.path.join(out_dir, f"tracker_init{suffix}.stablehlo")
        p2 = os.path.join(out_dir, f"tracker{suffix}.stablehlo")
        with open(p1, "wb") as fh:
            fh.write(exp_init.serialize())
        with open(p2, "wb") as fh:
            fh.write(exp_track.serialize())
        paths[f"tracker_init{suffix}"] = p1
        paths[f"tracker{suffix}"] = p2
    return paths


def load_exported(path: str):
    """Deserialize an exported graph; returns a callable."""
    with open(path, "rb") as fh:
        exported = jax.export.deserialize(bytearray(fh.read()))
    return lambda *args: exported.call(*args)


class ExportedTracker:
    """Reference-API (initialize/update) tracker driven ENTIRELY by the
    serialized deployment pair — the quality-evaluation harness for the
    artifact that actually ships, mirroring how the reference's deployed
    tracker consumes its FP16 CoreML pair (ref: VOTracker.swift:44-55,
    coreml_utils.py:54-58). Host-side crop geometry and postprocess are the
    production FEARTracker ones; only the network forwards come from the
    exported StableHLO graphs (normalization is baked into those)."""

    def __init__(self, init_path: str, track_path: str, config=None):
        from feartracker_tpu.tracker.config import TrackerConfig
        from feartracker_tpu.tracker.tracker import FEARTracker

        self._impl = FEARTracker.__new__(FEARTracker)
        t = self._impl
        t.config = config or TrackerConfig()
        t.native_preprocess = False
        t.model = t.variables = None
        t.bbox = t.mean_color = t.prev_size = None
        t._template_features = None
        # recovery + dual-template bookkeeping FEARTracker.__init__ would
        # have set (the exported pair always runs the static-template graph)
        t.recover_context = 0.0
        t.recover_threshold = t.config.confidence_threshold
        t.last_confidence = 1.0
        t.dynamic_template = False
        t.update_threshold = 0.85
        t.update_rate = 0.1
        t.update_interval = 1
        t._dyn_features = None
        t._frame_count = 0
        from collections import deque

        t.paths = deque(maxlen=10)

        from feartracker_tpu.core import postprocess as pp

        init_g = load_exported(init_path)
        track_g = load_exported(track_path)

        def _features(crop_u8):
            return init_g(jnp.asarray(crop_u8, jnp.float32)[None])

        def _step(crop_u8, feats, prev_size):
            reg, cls = track_g(jnp.asarray(crop_u8, jnp.float32)[None], feats)
            res = pp.postprocess(cls, reg, t.config.postprocess, prev_size=prev_size[None])
            return res.bbox[0], res.confidence[0]

        t._features_fn = _features
        t._step_fn = _step

    def initialize(self, image, rect):
        return self._impl.initialize(image, rect)

    def update(self, image):
        return self._impl.update(image)

    def reset(self):
        return self._impl.reset()


def main() -> None:
    """CLI entry — the analog of ``python evaluate/coreml_convert.py``
    (ref: coreml_convert.py:60-70 loads config+checkpoint and writes the
    Model/Model_quantized pair)."""
    import argparse
    import json

    from feartracker_tpu.convert.load import default_weights_path, load_variables

    p = argparse.ArgumentParser(description="Export the two-graph StableHLO deployment pair")
    p.add_argument("--weights_path",
                   default=None)
    p.add_argument("--out_dir", default="outputs/export")
    p.add_argument("--no_quantize", action="store_true", help="skip the bf16 variants")
    args = p.parse_args()

    paths = export_tracker(
        FEARNet(), load_variables(args.weights_path or default_weights_path()), args.out_dir,
        quantize=not args.no_quantize,
    )
    sizes = {k: os.path.getsize(v) for k, v in paths.items()}
    print(json.dumps({"paths": paths, "bytes": sizes}))


if __name__ == "__main__":
    main()
