"""Production serving layer: a fixed-capacity pool of live tracking streams.

The reference's serving story is one tracker per device with external
re-init on failure (ref: FEARTrackingViewController.swift:37-61,98-103 —
per-camera, CoreML). On TPU the economics invert: one chip serves hundreds
of streams, so serving needs slot management on top of the scan runtime:

  * ``add(frame, bbox)``      — claim a slot, build its template on device
  * ``remove(slot)``          — release a slot
  * ``step(frames)``          — advance every active slot one frame
  * failure policy            — what happens when a slot's confidence drops
    below the threshold:

    - ``"notify"`` (default): the slot keeps tracking and the failure flag is
      surfaced to the caller, who re-inits with a fresh (frame, bbox) — the
      exact iOS contract (VOTracker.swift:84-86 throws to the caller;
      FEARTrackingViewController.swift:98-103 resets the UI).
    - ``"reinit"``: the slot re-templates itself from its current prediction.
      CAUTION: if confidence collapsed because the box drifted off-target,
      re-templating on the drifted box locks the failure in — use only when
      no caller can supply ground truth (e.g. unattended bulk processing).

All state lives in fixed-shape device arrays (slot updates are jitted
scatter ops) — shapes never change, so nothing ever recompiles.

Pipelined stepping: JAX dispatch is asynchronous — ``step_async`` returns a
``PendingStep`` handle immediately (the pool's device state advances at
dispatch time) and the host fetch happens in ``PendingStep.result()``. Keeping
1–3 steps in flight hides the per-dispatch host↔device latency behind device
compute, which is what makes fixed-cadence serving reachable on remote-
attached accelerators (see ``evaluate/fps.pipelined_online_benchmark``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.tracker.runtime import ScanTracker, StreamState


class PendingStep:
    """An in-flight ``StreamPool`` step: device outputs not yet fetched.

    ``result()`` blocks on the host fetch and applies the pool's failure
    policy. Under the ``"reinit"`` policy the re-template happens when the
    result is drained — with k steps in flight that is k steps after the
    failing frame, from the frame the failure was detected on (the stale
    window is the price of pipelining; the ``"notify"`` policy is unaffected
    since the caller's re-init is asynchronous anyway).
    """

    def __init__(self, pool: "StreamPool", out: Dict[str, jnp.ndarray], active: np.ndarray, frames: Optional[np.ndarray]):
        self._pool = pool
        self._out = out
        self._active = active
        self._frames = frames  # retained only under the "reinit" policy
        self._result: Optional[Dict[str, Any]] = None

    def result(self) -> Dict[str, Any]:
        if self._result is None:
            out, self._out = self._out, None
            self._result = self._pool._drain(out, self._active, self._frames)
            self._frames = None
        return self._result


class StreamPool:
    def __init__(
        self,
        tracker: ScanTracker,
        capacity: int,
        frame_hw,
        auto_reinit: bool = False,
        failure_policy: str = None,
    ):
        self.tracker = tracker
        self.capacity = capacity
        self.frame_hw = tuple(frame_hw)
        # failure_policy wins; auto_reinit=True is the legacy spelling of "reinit"
        policy = failure_policy or ("reinit" if auto_reinit else "notify")
        if policy not in ("notify", "reinit"):
            raise ValueError(f"failure_policy must be 'notify' or 'reinit', got {policy!r}")
        self.failure_policy = policy
        self.auto_reinit = policy == "reinit"
        self.active = np.zeros(capacity, bool)
        self._free: List[int] = list(range(capacity))
        self._step_count = 0  # paces the dual-template update_interval

        H, W = self.frame_hw
        # derive the template feature shape from a cheap probe instead of
        # config arithmetic (stride conventions vary across model configs)
        probe = tracker._template_features(
            tracker.variables,
            tracker._folded,
            jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, 4)) + jnp.asarray([0.0, 0.0, 8.0, 8.0]),
            jnp.zeros((1, 3)),
        )
        fs = probe.shape[1:]
        z = jnp.zeros
        self.state = StreamState(
            template_feats=z((capacity,) + fs, probe.dtype),
            dyn_feats=z((capacity,) + fs, probe.dtype),
            bbox=jnp.tile(jnp.asarray([[0.0, 0.0, 8.0, 8.0]], jnp.float32), (capacity, 1)),
            mean_color=z((capacity, 3), jnp.float32),
            confidence=z((capacity,), jnp.float32),
        )

        @jax.jit
        def _write_slot(state: StreamState, slot, sub: StreamState) -> StreamState:
            return StreamState(
                template_feats=state.template_feats.at[slot].set(sub.template_feats[0]),
                dyn_feats=state.dyn_feats.at[slot].set(sub.dyn_feats[0]),
                bbox=state.bbox.at[slot].set(sub.bbox[0]),
                mean_color=state.mean_color.at[slot].set(sub.mean_color[0]),
                confidence=state.confidence.at[slot].set(sub.confidence[0]),
            )

        self._write_slot = _write_slot

    # -- slot management -----------------------------------------------------

    def add(self, frame: np.ndarray, bbox) -> int:
        """Claim a slot and initialize it from (frame, bbox); returns slot id."""
        if not self._free:
            raise RuntimeError(f"stream pool exhausted ({self.capacity} slots)")
        assert frame.shape[:2] == self.frame_hw, (frame.shape, self.frame_hw)
        slot = self._free.pop(0)
        sub = self.tracker._init_jit(
            self.tracker.variables,
            self.tracker._folded,
            jnp.asarray(frame)[None],
            jnp.asarray(np.asarray(bbox, np.float32))[None],
            None,
        )
        self.state = self._write_slot(self.state, slot, sub)
        self.active[slot] = True
        return slot

    def remove(self, slot: int) -> None:
        if not self.active[slot]:
            return
        self.active[slot] = False
        self._free.append(slot)

    @property
    def num_active(self) -> int:
        return int(self.active.sum())

    # -- stepping ------------------------------------------------------------

    def step(self, frames: np.ndarray) -> Dict[str, Any]:
        """Advance all slots one frame. ``frames``: (capacity, H, W, 3) —
        inactive slots may carry anything (their outputs are masked) — or a
        single (H, W, 3) frame shared by every slot (one camera, many
        tracked objects: ScanTracker multi-object mode, transferred once)."""
        return self.step_async(frames).result()

    def step_async(self, frames: np.ndarray) -> PendingStep:
        """Dispatch one step without waiting for its outputs.

        The pool's device state advances immediately, so further
        ``step_async`` calls can be enqueued while earlier outputs are still
        in flight; fetch them in dispatch order via ``PendingStep.result()``.
        """
        self.state, out = self.tracker.step(self.state, frames, step_index=self._step_count)
        self._step_count += 1
        return PendingStep(
            self, out, self.active.copy(), frames if self.auto_reinit else None
        )

    def step_chunk(self, frames: np.ndarray) -> Dict[str, Any]:
        """Advance all slots through a (T, capacity, H, W, 3) frame chunk on
        device in one dispatch (`lax.scan` over T) — the serving mode for
        remote-attached accelerators where per-frame dispatch dominates (see
        docs/SERVING.md). Also accepts a shared (T, H, W, 3) chunk: one video
        feeding every slot (multi-object). Outputs carry the leading T axis."""
        return self.step_chunk_async(frames).result()

    def step_chunk_async(self, frames: np.ndarray) -> PendingStep:
        """Dispatch a chunk without waiting; pipeline like ``step_async``."""
        T = frames.shape[0]
        self.state, out = self.tracker.track(
            self.state, frames, start_step=self._step_count
        )
        self._step_count += T
        return PendingStep(
            self, out, self.active.copy(), frames[-1] if self.auto_reinit else None
        )

    def _drain(self, out, active: np.ndarray, frames: Optional[np.ndarray]) -> Dict[str, Any]:
        """Host fetch + failure policy for one dispatched step (per-frame
        outputs (capacity, ...) or chunked (T, capacity, ...))."""
        result = {
            "bbox": np.asarray(out["bbox"]),
            "confidence": np.asarray(out["confidence"]),
            "failure": np.asarray(out["failure"]) & active,  # active broadcasts over T
            "active": active,
        }
        if self.auto_reinit:
            # chunked: a slot that failed on ANY frame of the chunk is
            # re-templated (failure OR-ed over T — a flag that clears by the
            # last frame must not mask the mid-chunk failure); the template
            # source is the chunk's last frame/prediction, the freshest state
            failure = result["failure"].any(0) if result["failure"].ndim == 2 else result["failure"]
            bbox = result["bbox"][-1] if result["bbox"].ndim == 3 else result["bbox"]
            # ``frames`` is the dispatch's LAST frame — (capacity, H, W, 3)
            # per-slot or one shared (H, W, 3) (multi-object mode) — or a
            # full (T, capacity, H, W, 3) chunk from a direct caller
            if frames.ndim == 5:
                frames = frames[-1]
            for slot in np.nonzero(failure & self.active)[0]:
                src = frames if frames.ndim == 3 else frames[slot]
                sub = self.tracker._init_jit(
                    self.tracker.variables,
                    self.tracker._folded,
                    jnp.asarray(src)[None],
                    jnp.asarray(bbox[slot], jnp.float32)[None],
                    None,
                )
                self.state = self._write_slot(self.state, int(slot), sub)
        return result
