"""Multi-chip stream-parallel tracking.

Streams are embarrassingly parallel (per-stream state, no cross-stream
math), so scaling the scan runtime across a pod slice is pure data
parallelism over the stream axis: inputs and carried state are sharded over
the ``data`` mesh axis with ``NamedSharding`` and XLA partitions the whole
scan with zero collectives — ICI is only touched if a host feeds frames for
streams resident on another chip. This is the "sequence scaling" story of
the TPU build (SURVEY.md §5: batch many independent videos per chip, then
many chips).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feartracker_tpu.parallel.mesh import DATA_AXIS
from feartracker_tpu.tracker.runtime import ScanTracker, StreamState


class ShardedScanTracker(ScanTracker):
    """ScanTracker whose stream axis is sharded over a device mesh.

    Stream count must be divisible by the mesh size. Weights are replicated;
    state and frames are sharded on their leading (stream) axis — for frame
    tensors (T, S, H, W, 3) the shard axis is axis 1.
    """

    def __init__(self, *args, mesh: Mesh, **kwargs):
        super().__init__(*args, **kwargs)
        if self.trunk_impl != "xla":
            raise ValueError(
                "ShardedScanTracker requires trunk_impl='xla': the fused "
                "Pallas trunk has no partitioning rule for a sharded stream axis"
            )
        self.mesh = mesh
        self._stream_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self._chunk_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        self._replicated = NamedSharding(mesh, P())
        self.variables = jax.device_put(self.variables, self._replicated)
        if self._gate is not None:
            self._gate = jax.device_put(self._gate, self._replicated)

    def _shard_state(self, state: StreamState) -> StreamState:
        return jax.tree.map(lambda x: jax.device_put(x, self._stream_sharding), state)

    def init(self, frames, bboxes, mean_color=None) -> StreamState:
        """Same contract as ScanTracker.init: ``mean_color`` (S, 3) overrides
        the pad color — letterboxed callers (evaluate/batched_eval.py) must
        pass the mean of the real image region, not the letterboxed frame.

        Multi-object mode (rank-3 / rank-3-per-step frames: S objects in ONE
        shared video) replicates the frame across the mesh — one small
        transfer; the stream parallelism lives entirely in the sharded
        state/bboxes, and the in-graph broadcast stays collective-free."""
        frames = jax.numpy.asarray(frames)
        frames = jax.device_put(
            frames,
            self._replicated if frames.ndim == 3 else self._stream_sharding,
        )
        bboxes = jax.device_put(jax.numpy.asarray(bboxes), self._stream_sharding)
        mc = None
        if mean_color is not None:
            mc = jax.device_put(
                jax.numpy.asarray(mean_color, jax.numpy.float32), self._stream_sharding
            )
        return self._init_jit(self.variables, self._folded, frames, bboxes, mc)

    def step(self, state: StreamState, frames, step_index=None):
        frames = jax.numpy.asarray(frames)
        frames = jax.device_put(
            frames,
            self._replicated if frames.ndim == 3 else self._stream_sharding,
        )
        idx = None
        if step_index is not None:
            idx = jax.numpy.asarray(step_index, jax.numpy.int32)
        return self._step_jit(self.variables, self._folded, self._gate, state, frames, idx)

    def track(self, state: StreamState, frames, start_step: int = 0):
        frames = jax.numpy.asarray(frames)
        frames = jax.device_put(
            frames,
            self._replicated if frames.ndim == 4 else self._chunk_sharding,
        )
        return self._track_jit(
            self.variables, self._folded, self._gate, state, frames,
            jax.numpy.asarray(start_step, jax.numpy.int32),
        )
