"""Fully on-device tracking runtime: ``lax.scan`` over frames, batched over
independent video streams.

This is the TPU-native replacement for the reference's per-frame Python loop
(ref: demo_video.py:22-28, fear_tracker.py:46-67, SURVEY.md §3.1): the crop →
normalize → backbone → correlation head → penalty-window decode → rescale →
clamp chain is one jitted graph; the sequential frame dependence is carried by
``lax.scan`` state, and throughput comes from batching S streams per chip
(frame t of every stream in one batch — the MXU sees (S,256,256,3) batches
instead of single images).

The dual-template update — absent from the released reference code but left
as a hook (ref: blocks.py:174-181, README.md:96) — runs here on device: when
confidence exceeds a threshold, a fresh template crop is taken at the
predicted bbox, encoded, and EMA-blended into the dynamic template carried in
scan state. No host round-trips anywhere in the loop.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from feartracker_tpu.core import postprocess as pp
from feartracker_tpu.core.geometry_jax import clamp_bbox, rescale_crop_bbox
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.ops.crop import (
    crop_bbox_in_window,
    crop_resize,
    crop_resize_mm,
    extended_crop_window,
    normalize_imagenet,
)
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.utils.constants import (
    TARGET_CLASSIFICATION_KEY,
    TARGET_REGRESSION_LABEL_KEY,
)


class StreamState(NamedTuple):
    """Per-stream carried state (leading axis = streams)."""

    template_feats: jnp.ndarray  # (S, 8, 8, C) static template
    dyn_feats: jnp.ndarray  # (S, 8, 8, C) dynamic (dual) template
    bbox: jnp.ndarray  # (S, 4) xywh, frame coords, float32
    mean_color: jnp.ndarray  # (S, 3) pad color from the init frame
    confidence: jnp.ndarray  # (S,) last classification peak


class ScanTracker:
    """Compiled multi-stream tracker.

    Args:
      model / variables: the FEARNet and its weights.
      config: decode constants (static; baked into the jitted graphs).
      dynamic_template: enable the on-device dual-template update.
      update_threshold / update_rate: confidence gate and EMA rate for it.
    """

    def __init__(
        self,
        model: FEARNet,
        variables: Dict[str, Any],
        config: TrackerConfig = TrackerConfig(),
        dynamic_template: bool = False,
        update_threshold: float = 0.85,
        update_rate: float = 0.1,
        update_mode: str = "ema",
        update_interval: int = 1,
        gate_params: Any = None,
        dtype: jnp.dtype = jnp.float32,
        crop_impl: str = "mm",
        postprocess_impl: str = "xla",
        trunk_impl: str = "xla",
        scan_unroll: int = 1,
        recover_context: float = 0.0,
        recover_threshold: float = None,
    ):
        # "mm" = separable-matmul crop (MXU, fast); "gather" = index-based
        # (bit-identical reference semantics; both match to float rounding)
        self.crop_impl = crop_impl
        # "pallas" = fused single-kernel decode (TPU only); "xla" = portable
        self.postprocess_impl = postprocess_impl
        # "fused" = folded-BN trunk with the fused IR-block Pallas kernel
        # (ops/pallas/ir_block.py) — the expanded intermediates stay in VMEM
        # instead of round-tripping HBM. Single-mesh-device paths only (the
        # Pallas call has no partitioning rule for sharded stream axes).
        if trunk_impl not in ("xla", "fused"):
            raise ValueError(f"trunk_impl must be 'xla' or 'fused', got {trunk_impl!r}")
        self.trunk_impl = trunk_impl
        self.model = model
        self.variables = variables
        self.config = config
        self.dynamic_template = dynamic_template
        self.update_threshold = update_threshold
        self.update_rate = update_rate
        # "ema": dyn <- (1-r)·dyn + r·candidate; "gated": paper-style learned
        # interpolation of the STATIC template with the candidate, weighted
        # by sigmoid(template_gate) FROM THE LOADED WEIGHTS
        # (models/fear_net.forward_dual). NOTE: recovered FEAR-XS checkpoints
        # zero-fill template_gate (convert/fear_weights.py) — with those, the
        # "gated" blend is the untrained sigmoid(0)=0.5; a trained gate comes
        # from tools/train_template_gate.py (fear_xs_gate.npz)
        # "feature": gate v2 — a tiny learned MLP over the per-frame
        # observables (confidence, APCE, candidate similarity, bbox
        # stability; models/gate.py) sets the per-stream EMA rate each frame:
        # rate = sigmoid(MLP(obs)) · update_rate. No hard confidence
        # threshold in this mode — the gate subsumes it. Weights come from
        # tools/train_feature_gate.py (gate_params / a .npz path).
        if update_mode not in ("ema", "gated", "feature"):
            raise ValueError(
                f"update_mode must be 'ema', 'gated' or 'feature', got {update_mode!r}"
            )
        self.update_mode = update_mode
        self._gate = None
        if update_mode == "feature":
            from feartracker_tpu.models.gate import load_gate

            if gate_params is None:
                raise ValueError("update_mode='feature' requires gate_params")
            if isinstance(gate_params, str):
                gate_params = load_gate(gate_params)
            self._gate = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), gate_params)
        elif gate_params is not None:
            raise ValueError("gate_params is only meaningful with update_mode='feature'")
        # consider a template refresh only every K-th scanned frame: the
        # candidate-encoder pass is the dual-template mode's entire overhead
        # (~30% of the step), and `lax.cond` on the scalar frame index
        # genuinely skips it on off-cadence frames (conditional HLO, not a
        # masked select). K=1 = refresh-eligible every frame.
        if update_interval < 1:
            raise ValueError(f"update_interval must be >= 1, got {update_interval}")
        self.update_interval = int(update_interval)
        # unroll the per-frame scan body K× (lax.scan unroll): 1/K the scan
        # boundary copies and a K-step fusion window for XLA, at K× the HLO.
        # Measured on chip: no gain beyond noise (BENCHMARKS.md roofline
        # close-out), kept as an experiment knob.
        if scan_unroll < 1:
            raise ValueError(f"scan_unroll must be >= 1, got {scan_unroll}")
        self.scan_unroll = int(scan_unroll)
        # zoom-out re-acquisition: when the previous frame's confidence fell
        # below recover_threshold, crop the NEXT search at recover_context
        # instead of cfg.search_context (a wider source window, same 256²
        # output — static shapes, fully in-graph). The reference's only
        # failure answer is a host-side re-init (VOTracker.swift:84-86);
        # this re-finds the target that slid out of the normal window, e.g.
        # after an occlusion episode. 0.0 = disabled.
        if recover_context < 0:
            raise ValueError(f"recover_context must be >= 0, got {recover_context}")
        self.recover_context = float(recover_context)
        self.recover_threshold = (
            config.confidence_threshold if recover_threshold is None
            else float(recover_threshold)
        )
        self.dtype = dtype
        self._folded = self._fold() if self.trunk_impl == "fused" else None
        # weights ride as jit arguments (device arrays), not baked constants;
        # the carried state is donated in track() (callers always rebind:
        # ``state, out = tracker.track(state, ...)``) — ~5% step time saved
        self._init_jit = jax.jit(self._init_impl)
        self._step_jit = jax.jit(self._step_impl)
        self._track_jit = jax.jit(self._track_impl, donate_argnums=(3,))

    def _fold(self):
        from feartracker_tpu.ops.fused_trunk import fold_fear_net

        return fold_fear_net(self.variables, tuple(self.model.trunk_blocks))

    def set_variables(self, variables: Dict[str, Any]) -> None:
        self.variables = variables
        if self.trunk_impl == "fused":
            self._folded = self._fold()

    # -- building blocks ---------------------------------------------------

    def _crop(self, frames, windows, out_size, mean_color):
        if self.crop_impl == "mm":
            # f32 resize math: XLA fuses the uint8→f32 frame cast into the
            # contraction (measured: bf16 operators change neither bytes
            # accessed nor wall time — the traffic lives in model
            # activations), and f32 keeps the crop bit-comparable to the
            # host/reference path.
            return jax.vmap(
                lambda f, w, m: crop_resize_mm(f, w, out_size, m, jnp.float32)
            )(frames, windows, mean_color)
        return jax.vmap(crop_resize, (0, 0, None, 0))(
            frames.astype(jnp.float32), windows, out_size, mean_color
        )

    def _features(self, variables, folded, x: jnp.ndarray) -> jnp.ndarray:
        """trunk + neck on a normalized crop batch, via the configured path."""
        if folded is not None:
            from feartracker_tpu.ops.fused_trunk import get_features_folded

            return get_features_folded(x, folded, tuple(self.model.trunk_blocks))
        return self.model.apply(variables, x, method=self.model.get_features)

    def _template_features(self, variables, folded, frames: jnp.ndarray, bboxes: jnp.ndarray, mean_color: jnp.ndarray) -> jnp.ndarray:
        """Template crop (offset 0.2 → 128²) + encode (ref: fear_tracker.py:36-44)."""
        cfg = self.config
        windows = jax.vmap(extended_crop_window, (0, None))(bboxes, cfg.template_bbox_offset)
        crops = self._crop(frames, windows, cfg.template_size, mean_color)
        x = normalize_imagenet(crops).astype(self.dtype)
        return self._features(variables, folded, x)

    @staticmethod
    def _broadcast_shared(frames: jnp.ndarray, num_streams: int) -> jnp.ndarray:
        """Multi-object mode: a rank-3 (H, W, 3) frame is one video shared by
        all S streams (S objects tracked in the same footage). Broadcast to
        (S, H, W, 3) IN-GRAPH — XLA fuses the broadcast into the crop
        gather/contraction, so the frame is transferred and stored once
        regardless of S (the host-side alternative, ``np.tile`` before
        ``track()``, pays S× the host→device bandwidth)."""
        if frames.ndim == 3:
            return jnp.broadcast_to(frames[None], (num_streams,) + frames.shape)
        return frames

    def _init_impl(self, variables, folded, frames: jnp.ndarray, bboxes: jnp.ndarray, mean_color=None) -> StreamState:
        frames = self._broadcast_shared(frames, bboxes.shape[0])
        H, W = frames.shape[1], frames.shape[2]
        bboxes = clamp_bbox(bboxes.astype(jnp.float32), (H, W))
        if mean_color is None:
            mean_color = jnp.mean(frames.astype(jnp.float32), axis=(1, 2))
        feats = self._template_features(variables, folded, frames, bboxes, mean_color)
        return StreamState(
            template_feats=feats,
            dyn_feats=feats,
            bbox=bboxes,
            mean_color=mean_color,
            confidence=jnp.ones(frames.shape[0], jnp.float32),
        )

    def _step_impl(
        self, variables, folded, gate, state: StreamState, frames: jnp.ndarray, step_index=None
    ) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        frames = self._broadcast_shared(frames, state.bbox.shape[0])
        H, W = frames.shape[1], frames.shape[2]

        if self.recover_context:
            # per-stream context: widen the window after a low-confidence
            # frame (state.confidence is the previous step's peak)
            ctx = jnp.where(
                state.confidence < self.recover_threshold,
                self.recover_context, cfg.search_context,
            )
            windows = jax.vmap(extended_crop_window)(state.bbox, ctx)
        else:
            windows = jax.vmap(extended_crop_window, (0, None))(state.bbox, cfg.search_context)
        crops = self._crop(frames, windows, cfg.instance_size, state.mean_color)
        x = normalize_imagenet(crops).astype(self.dtype)

        update = state.dyn_feats if self.dynamic_template else None
        # model.track ≡ get_features + connector; composing through
        # _features keeps one code path for both trunk impls
        search_features = self._features(variables, folded, x)
        out = self.model.apply(
            variables, state.template_feats, search_features, update,
            method=self.model.connector,
        )

        prev_size = jax.vmap(crop_bbox_in_window, (0, 0, None))(state.bbox, windows, cfg.instance_size)[:, 2:]
        if self.postprocess_impl == "pallas":
            from feartracker_tpu.ops.pallas.decode import postprocess_pallas

            res = postprocess_pallas(
                out[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
                out[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
                cfg.postprocess,
                prev_size=prev_size,
                # Mosaic kernels only compile on TPU; elsewhere run interpreted
                interpret=jax.default_backend() != "tpu",
            )
        else:
            res = pp.postprocess(
                out[TARGET_CLASSIFICATION_KEY].astype(jnp.float32),
                out[TARGET_REGRESSION_LABEL_KEY].astype(jnp.float32),
                cfg.postprocess,
                prev_size=prev_size,
            )
        bbox = rescale_crop_bbox(res.bbox, windows, cfg.instance_size)
        bbox = clamp_bbox(bbox, (H, W))

        # per-frame map-sharpness diagnostic (not an update gate — see
        # pp.apce docstring for the measured negative); cheap (S×256
        # elementwise) next to the 1.3 GFLOP forward
        score = jax.nn.sigmoid(
            out[TARGET_CLASSIFICATION_KEY].astype(jnp.float32)
        )[..., 0]
        apce = pp.apce(score)

        dyn = state.dyn_feats
        gate_obs = None
        if self.dynamic_template:
            from feartracker_tpu.models.gate import (
                N_OBS,
                gate_observables,
                gate_rate,
            )

            def refresh(dyn):
                cand = self._template_features(variables, folded, frames, bbox, state.mean_color)
                # per-frame observables (models/gate.py contract) — emitted
                # for the gate-training collector and consumed by gate v2
                obs = gate_observables(
                    res.confidence, apce, cand, state.template_feats, dyn,
                    bbox, state.bbox,
                )
                if self.update_mode == "feature":
                    # gate v2: learned per-stream EMA rate, no hard threshold
                    r = (gate_rate(gate, obs) * self.update_rate)[
                        :, None, None, None
                    ].astype(dyn.dtype)
                    return (1.0 - r) * dyn + r * cand, obs
                ok = (res.confidence > self.update_threshold)[:, None, None, None]
                if self.update_mode == "gated":
                    g = jax.nn.sigmoid(variables["params"]["template_gate"]).astype(dyn.dtype)
                    blended = (1.0 - g) * state.template_feats + g * cand
                else:
                    blended = (1.0 - self.update_rate) * dyn + self.update_rate * cand
                return jnp.where(ok, blended, dyn), obs

            if step_index is not None and self.update_interval > 1:
                dyn, gate_obs = jax.lax.cond(
                    step_index % self.update_interval == 0,
                    refresh,
                    lambda d: (d, jnp.zeros((d.shape[0], N_OBS), jnp.float32)),
                    dyn,
                )
            else:
                dyn, gate_obs = refresh(dyn)

        new_state = StreamState(
            template_feats=state.template_feats,
            dyn_feats=dyn,
            bbox=bbox,
            mean_color=state.mean_color,
            confidence=res.confidence,
        )
        outputs = {
            "bbox": bbox,
            "confidence": res.confidence,
            "apce": apce,
            "failure": res.confidence < cfg.confidence_threshold,
        }
        if gate_obs is not None:
            outputs["gate_obs"] = gate_obs
        return new_state, outputs

    def _track_impl(self, variables, folded, gate, state: StreamState, frames: jnp.ndarray, start_step=0):
        """frames: (T, S, H, W, 3) or shared (T, H, W, 3) → (state, outputs
        stacked over T).

        ``start_step`` offsets the frame indices that pace the dual-template
        ``update_interval`` cadence across chunked track() calls."""
        idx = jnp.arange(frames.shape[0]) + start_step
        return jax.lax.scan(
            lambda c, ft: self._step_impl(variables, folded, gate, c, ft[0], ft[1]),
            state, (frames, idx), unroll=self.scan_unroll,
        )

    # -- public API --------------------------------------------------------

    def init(self, frames, bboxes, mean_color=None) -> StreamState:
        """First frame of every stream + initial boxes → carried state.

        ``frames``: (S, H, W, 3) — one video per stream — or (H, W, 3) for
        **multi-object tracking**: S objects (one per ``bboxes`` row) in the
        same video, broadcast in-graph (see _broadcast_shared).

        ``mean_color`` (S, 3) overrides the pad color (default: frame mean,
        ref fear_tracker.py:27 — callers feeding letterboxed frames should
        pass the mean of the real image region)."""
        mc = None if mean_color is None else jnp.asarray(mean_color, jnp.float32)
        return self._init_jit(self.variables, self._folded, jnp.asarray(frames), jnp.asarray(bboxes), mc)

    def step(self, state: StreamState, frames, step_index=None) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
        """One frame for every stream: (S, H, W, 3), or (H, W, 3) shared by
        all S streams (multi-object mode — transferred once regardless of S).

        ``step_index`` (running frame count) paces the dual-template
        ``update_interval``; None = refresh-eligible on this frame."""
        idx = None if step_index is None else jnp.asarray(step_index, jnp.int32)
        return self._step_jit(self.variables, self._folded, self._gate, state, jnp.asarray(frames), idx)

    def track(self, state: StreamState, frames, start_step: int = 0) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
        """A chunk of frames (T, S, H, W, 3), scanned on device — or
        (T, H, W, 3) for multi-object mode: every stream tracks its own
        object through the SAME footage, and the chunk is host→device
        transferred once instead of S times (the transfer is the live-serving
        bottleneck; BENCHMARKS.md "Multi-object tracking").

        ``start_step``: global index of the chunk's first frame — keeps the
        dual-template ``update_interval`` cadence steady across chunks (pass
        a running frame count; irrelevant when update_interval == 1).

        NOTE: ``state`` is DONATED — its buffers are invalid afterwards.
        Always rebind: ``state, out = tracker.track(state, frames)``.
        """
        return self._track_jit(
            self.variables, self._folded, self._gate, state, jnp.asarray(frames),
            jnp.asarray(start_step, jnp.int32),
        )
