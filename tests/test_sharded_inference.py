"""Stream-sharded inference on the 8-device CPU mesh: identical results to
single-device, state/outputs actually sharded."""

import jax
import jax.numpy as jnp
import numpy as np

from feartracker_tpu.models.fbnet import TINY_TRUNK
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.parallel.inference import ShardedScanTracker
from feartracker_tpu.parallel.mesh import make_mesh
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.runtime import ScanTracker

CFG = TrackerConfig(
    score_size=8, total_stride=8, instance_size=64, template_size=32,
)


def _setup():
    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    rng = np.random.RandomState(0)
    S, T = 16, 4
    frames0 = rng.randint(0, 255, (S, 96, 128, 3)).astype(np.float32)
    chunk = rng.randint(0, 255, (T, S, 96, 128, 3)).astype(np.float32)
    bboxes = np.tile(np.array([[40, 30, 30, 40]], np.float32), (S, 1))
    return model, variables, frames0, chunk, bboxes


def test_sharded_matches_single_device():
    model, variables, frames0, chunk, bboxes = _setup()
    mesh = make_mesh(8)

    single = ScanTracker(model, variables, CFG)
    s_state = single.init(frames0, bboxes)
    s_state, s_out = single.track(s_state, chunk)

    sharded = ShardedScanTracker(model, variables, CFG, mesh=mesh)
    d_state = sharded.init(frames0, bboxes)
    d_state, d_out = sharded.track(d_state, chunk)

    np.testing.assert_allclose(
        np.asarray(d_out["bbox"]), np.asarray(s_out["bbox"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(d_state.bbox), np.asarray(s_state.bbox), atol=1e-3
    )
    # streams really live across devices
    assert len(d_state.bbox.sharding.device_set) == 8


def test_sharded_dynamic_template():
    model, variables, frames0, chunk, bboxes = _setup()
    mesh = make_mesh(8)
    sharded = ShardedScanTracker(
        model, variables, CFG, mesh=mesh, dynamic_template=True, update_threshold=0.0
    )
    state = sharded.init(frames0, bboxes)
    state, out = sharded.track(state, chunk)
    assert np.isfinite(np.asarray(out["bbox"])).all()
    assert len(state.dyn_feats.sharding.device_set) == 8


def test_update_interval_cadence():
    """update_interval=2: the template refreshes only on even global frame
    indices, and the start_step offset keeps the cadence across chunks."""
    model, variables, frames0, chunk, bboxes = _setup()
    every = ScanTracker(model, variables, CFG, dynamic_template=True, update_threshold=-1.0)
    paced = ScanTracker(
        model, variables, CFG, dynamic_template=True, update_threshold=-1.0, update_interval=2
    )

    st_e = every.init(frames0, bboxes)
    st_p = paced.init(frames0, bboxes)
    np.testing.assert_array_equal(np.asarray(st_e.dyn_feats), np.asarray(st_p.dyn_feats))

    # frame indices 0..3: paced refreshes at 0 and 2 only
    dyn_e, dyn_p = [], []
    for t in range(4):
        st_e, _ = every.track(st_e, chunk[t : t + 1], start_step=t)
        st_p, _ = paced.track(st_p, chunk[t : t + 1], start_step=t)
        dyn_e.append(np.asarray(st_e.dyn_feats))
        dyn_p.append(np.asarray(st_p.dyn_feats))

    # refresh frames: paced changed its dyn template
    assert np.abs(dyn_p[0] - np.asarray(st_p.template_feats)).max() > 0
    # skip frame 1: paced dyn unchanged from frame 0, while 'every' moved on
    np.testing.assert_array_equal(dyn_p[1], dyn_p[0])
    assert np.abs(dyn_e[1] - dyn_e[0]).max() > 0
    # frame 2 refreshes again
    assert np.abs(dyn_p[2] - dyn_p[1]).max() > 0
    np.testing.assert_array_equal(dyn_p[3], dyn_p[2])


def test_gated_update_mode():
    """'gated' dual-template mode uses the learned interpolation of the
    static template with the candidate."""
    model, variables, frames0, chunk, bboxes = _setup()
    tr = ScanTracker(
        model, variables, CFG, dynamic_template=True, update_threshold=-1.0, update_mode="gated"
    )
    state = tr.init(frames0, bboxes)
    state, out = tr.track(state, chunk)
    assert np.isfinite(np.asarray(out["bbox"])).all()
    # gate starts at sigmoid(0)=0.5: dyn = 0.5·static + 0.5·candidate ≠ static
    assert np.abs(np.asarray(state.dyn_feats) - np.asarray(state.template_feats)).max() > 0


def test_pallas_postprocess_on_cpu_interprets():
    """postprocess_impl='pallas' must run on CPU too (interpret mode)."""
    model, variables, frames0, chunk, bboxes = _setup()
    tr = ScanTracker(model, variables, CFG, postprocess_impl="pallas")
    state = tr.init(frames0, bboxes)
    state, out = tr.track(state, chunk[:2])
    ref = ScanTracker(model, variables, CFG)
    rstate = ref.init(frames0, bboxes)
    rstate, rout = ref.track(rstate, chunk[:2])
    np.testing.assert_allclose(
        np.asarray(out["bbox"]), np.asarray(rout["bbox"]), atol=1e-2
    )


def test_sharded_multiobject_shared_frames():
    """Multi-object mode on the mesh: a shared (replicated) video with the
    stream/object axis sharded must equal the tiled per-stream path — and the
    carried state must stay sharded over the mesh."""
    model, variables, frames0, chunk, bboxes = _setup()
    mesh = make_mesh(8)
    S = bboxes.shape[0]
    video0 = frames0[0]            # (H, W, 3) shared by all S objects
    video = chunk[:, 0]            # (T, H, W, 3)
    boxes = np.stack([[10 + 3 * i, 10 + 2 * i, 30, 40] for i in range(S)]).astype(np.float32)

    sharded = ShardedScanTracker(model, variables, CFG, mesh=mesh)
    st_shared = sharded.init(video0, boxes)
    assert len(st_shared.bbox.sharding.device_set) == 8
    st_shared, out_shared = sharded.track(st_shared, video)

    tiled0 = np.broadcast_to(video0, (S, *video0.shape)).copy()
    tiled = np.broadcast_to(video[:, None], (video.shape[0], S, *video0.shape)).copy()
    st_tiled = sharded.init(tiled0, boxes)
    st_tiled, out_tiled = sharded.track(st_tiled, tiled)

    np.testing.assert_array_equal(
        np.asarray(out_shared["bbox"]), np.asarray(out_tiled["bbox"])
    )
    st_shared, out_s = sharded.step(st_shared, video0)
    st_tiled, out_t = sharded.step(st_tiled, tiled0)
    np.testing.assert_array_equal(np.asarray(out_s["bbox"]), np.asarray(out_t["bbox"]))
