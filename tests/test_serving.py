"""Stream pool serving layer: slot lifecycle, masked outputs, capacity, and
consistency with a dedicated single-stream tracker."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.models.fbnet import TINY_TRUNK
from feartracker_tpu.models.fear_net import FEARNet
from feartracker_tpu.tracker.config import TrackerConfig
from feartracker_tpu.tracker.runtime import ScanTracker
from feartracker_tpu.tracker.serving import StreamPool

CFG = TrackerConfig(score_size=8, total_stride=8, instance_size=64, template_size=32)
HW = (96, 128)


@pytest.fixture(scope="module")
def tracker():
    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 64, 64, 3))),
        train=False,
    )
    return ScanTracker(model, variables, CFG)


def _frames(rng, n=1):
    return rng.randint(0, 255, (n, *HW, 3)).astype(np.float32)


def test_scan_unroll_is_equivalent(tracker):
    """lax.scan unroll (the roofline probe knob) must not change outputs —
    including a T not divisible by the unroll factor."""
    rng = np.random.RandomState(4)
    frames = np.stack([np.broadcast_to(_frames(rng)[0], (2, *HW, 3)) for _ in range(5)])
    b0 = np.array([[40, 30, 30, 40], [20, 20, 30, 30]], np.float32)
    ref = None
    for unroll in (1, 2, 4):
        tr = ScanTracker(tracker.model, tracker.variables, CFG, scan_unroll=unroll)
        st = tr.init(frames[0], b0)
        st, out = tr.track(st, frames)
        if ref is None:
            ref = np.asarray(out["bbox"])
        else:
            np.testing.assert_allclose(np.asarray(out["bbox"]), ref, atol=1e-5)
    with pytest.raises(ValueError):
        ScanTracker(tracker.model, tracker.variables, CFG, scan_unroll=0)


def test_slot_lifecycle(tracker):
    rng = np.random.RandomState(0)
    pool = StreamPool(tracker, capacity=4, frame_hw=HW)
    f = _frames(rng)[0]
    s0 = pool.add(f, [40, 30, 30, 40])
    s1 = pool.add(f, [10, 10, 20, 20])
    assert (s0, s1) == (0, 1) and pool.num_active == 2

    out = pool.step(np.broadcast_to(f, (4, *HW, 3)))
    assert out["bbox"].shape == (4, 4)
    assert out["active"].tolist() == [True, True, False, False]
    # inactive slots never flag failure
    assert not out["failure"][2:].any()

    pool.remove(s0)
    assert pool.num_active == 1
    s2 = pool.add(f, [50, 50, 20, 20])  # FIFO free list: next unused slot
    assert s2 == 2
    pool.add(f, [5, 5, 10, 10])
    s4 = pool.add(f, [6, 6, 10, 10])  # the freed slot 0 comes back around
    assert s4 == s0


def test_pool_capacity_guard(tracker):
    rng = np.random.RandomState(1)
    pool = StreamPool(tracker, capacity=2, frame_hw=HW)
    f = _frames(rng)[0]
    pool.add(f, [40, 30, 30, 40])
    pool.add(f, [10, 10, 20, 20])
    with pytest.raises(RuntimeError):
        pool.add(f, [5, 5, 10, 10])


def test_failure_policy_selectable(tracker):
    """'notify' (default, iOS contract) surfaces the failure and leaves the
    template untouched; 'reinit' re-templates from the current prediction."""
    rng = np.random.RandomState(3)
    f = _frames(rng)[0]

    notify = StreamPool(tracker, capacity=1, frame_hw=HW)  # default policy
    assert notify.failure_policy == "notify" and not notify.auto_reinit
    reinit = StreamPool(tracker, capacity=1, frame_hw=HW, failure_policy="reinit")
    assert reinit.auto_reinit
    legacy = StreamPool(tracker, capacity=1, frame_hw=HW, auto_reinit=True)
    assert legacy.failure_policy == "reinit"
    with pytest.raises(ValueError):
        StreamPool(tracker, capacity=1, frame_hw=HW, failure_policy="panic")

    for pool, retemplates in [(notify, False), (reinit, True)]:
        pool.add(f, [40, 30, 30, 40])
        before = np.asarray(pool.state.template_feats).copy()
        # blank frames collapse confidence below the threshold -> failure
        out = pool.step(np.zeros((1, *HW, 3), np.float32))
        assert out["failure"][0]
        after = np.asarray(pool.state.template_feats)
        changed = not np.allclose(before, after)
        assert changed == retemplates


def test_pipelined_steps_match_serial(tracker):
    """step_async with k steps in flight yields the same per-step results as
    the blocking step() — pipelining only reorders host fetches."""
    rng = np.random.RandomState(4)
    seq = _frames(rng, 6)

    serial = StreamPool(tracker, capacity=2, frame_hw=HW)
    serial.add(seq[0], [40, 30, 30, 40])
    serial_out = [serial.step(np.broadcast_to(seq[t], (2, *HW, 3))) for t in range(1, 6)]

    piped = StreamPool(tracker, capacity=2, frame_hw=HW)
    piped.add(seq[0], [40, 30, 30, 40])
    pending = [piped.step_async(np.broadcast_to(seq[t], (2, *HW, 3))) for t in range(1, 6)]
    piped_out = [p.result() for p in pending]

    for a, b in zip(serial_out, piped_out):
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
        np.testing.assert_array_equal(a["failure"], b["failure"])
    # result() is idempotent (cached after the first fetch)
    assert pending[0].result() is piped_out[0]


def test_pipelined_reinit_applies_on_drain(tracker):
    """Under the 'reinit' policy a failure re-templates when the result is
    drained (depth steps late by design), not at dispatch."""
    rng = np.random.RandomState(5)
    f = _frames(rng)[0]
    pool = StreamPool(tracker, capacity=1, frame_hw=HW, failure_policy="reinit")
    pool.add(f, [40, 30, 30, 40])
    before = np.asarray(pool.state.template_feats).copy()
    pending = pool.step_async(np.zeros((1, *HW, 3), np.float32))
    # not yet drained: template untouched
    np.testing.assert_allclose(np.asarray(pool.state.template_feats), before)
    out = pending.result()
    assert out["failure"][0]
    assert not np.allclose(np.asarray(pool.state.template_feats), before)


def test_pipelined_slot_churn_uses_dispatch_snapshot(tracker):
    """active/failure masks of an in-flight step reflect the slots active at
    DISPATCH; slots added/removed afterwards don't retroactively change it."""
    rng = np.random.RandomState(6)
    f = _frames(rng)[0]
    pool = StreamPool(tracker, capacity=3, frame_hw=HW)
    s0 = pool.add(f, [40, 30, 30, 40])
    pending = pool.step_async(np.broadcast_to(f, (3, *HW, 3)))
    s1 = pool.add(f, [10, 10, 20, 20])  # joins after dispatch
    pool.remove(s0)                     # leaves after dispatch
    out = pending.result()
    assert out["active"].tolist() == [True, False, False]  # dispatch snapshot
    assert not out["failure"][s1]
    # the next step sees the new membership
    out2 = pool.step(np.broadcast_to(f, (3, *HW, 3)))
    assert out2["active"].tolist() == [False, True, False]


def test_step_chunk_matches_per_frame(tracker):
    """One chunked dispatch over T frames equals T per-frame steps; outputs
    carry the leading T axis; the step counter advances by T."""
    rng = np.random.RandomState(7)
    seq = _frames(rng, 7)

    ref = StreamPool(tracker, capacity=2, frame_hw=HW)
    ref.add(seq[0], [40, 30, 30, 40])
    ref_boxes = [ref.step(np.broadcast_to(seq[t], (2, *HW, 3)))["bbox"] for t in range(1, 7)]

    pool = StreamPool(tracker, capacity=2, frame_hw=HW)
    pool.add(seq[0], [40, 30, 30, 40])
    chunk = np.stack([np.broadcast_to(seq[t], (2, *HW, 3)) for t in range(1, 7)])
    out = pool.step_chunk(chunk)
    assert out["bbox"].shape == (6, 2, 4)
    assert pool._step_count == 6
    np.testing.assert_allclose(out["bbox"], np.stack(ref_boxes), atol=1e-3)


def test_step_chunk_reinit_uses_last_frame(tracker):
    """Chunked 'reinit' drains re-template from the chunk's final frame."""
    rng = np.random.RandomState(8)
    f = _frames(rng)[0]
    pool = StreamPool(tracker, capacity=1, frame_hw=HW, failure_policy="reinit")
    pool.add(f, [40, 30, 30, 40])
    before = np.asarray(pool.state.template_feats).copy()
    chunk = np.zeros((3, 1, *HW, 3), np.float32)  # blank -> confidence collapse
    out = pool.step_chunk(chunk)
    assert out["failure"][-1, 0]
    assert not np.allclose(np.asarray(pool.state.template_feats), before)


def test_step_chunk_reinit_catches_mid_chunk_failure(tracker):
    """A slot whose failure flag clears by the chunk's final frame is still
    re-templated: the failure mask is OR-ed over T, not last-frame-only."""
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    f = _frames(rng)[0]
    pool = StreamPool(tracker, capacity=1, frame_hw=HW, failure_policy="reinit")
    pool.add(f, [40, 30, 30, 40])
    before = np.asarray(pool.state.template_feats).copy()
    fake_out = {
        "bbox": jnp.broadcast_to(jnp.asarray([62.0, 48.0, 24.0, 30.0]), (3, 1, 4)),
        "confidence": jnp.full((3, 1), 0.9),
        "failure": jnp.asarray([[False], [True], [False]]),  # clears by chunk end
    }
    chunk = np.broadcast_to(f, (3, 1, *HW, 3))
    out = pool._drain(fake_out, pool.active.copy(), chunk)
    assert out["failure"][1, 0] and not out["failure"][-1, 0]
    assert not np.allclose(np.asarray(pool.state.template_feats), before)


def test_pool_matches_dedicated_stream(tracker):
    """A slot tracked through the pool must produce the same trajectory as a
    1-stream ScanTracker with the same inputs."""
    rng = np.random.RandomState(2)
    seq = _frames(rng, 6)

    pool = StreamPool(tracker, capacity=3, frame_hw=HW)
    slot = pool.add(seq[0], [40, 30, 30, 40])
    pool_boxes = []
    for t in range(1, 6):
        out = pool.step(np.broadcast_to(seq[t], (3, *HW, 3)))
        pool_boxes.append(out["bbox"][slot])

    single = tracker.init(seq[0][None], np.array([[40, 30, 30, 40]], np.float32))
    state = single
    single_boxes = []
    for t in range(1, 6):
        state, out = tracker.step(state, seq[t][None])
        single_boxes.append(np.asarray(out["bbox"])[0])

    np.testing.assert_allclose(np.asarray(pool_boxes), np.asarray(single_boxes), atol=1e-3)


def test_pool_on_sharded_tracker_matches_single_device(tracker):
    """Pod-scale serving: StreamPool over a ShardedScanTracker (stream axis
    on the 8-device mesh) tracks identically to the single-device pool."""
    from feartracker_tpu.parallel.inference import ShardedScanTracker
    from feartracker_tpu.parallel.mesh import make_mesh

    sharded = ShardedScanTracker(
        tracker.model, tracker.variables, CFG, mesh=make_mesh()
    )
    rng = np.random.RandomState(7)
    frames = _frames(rng, 3)
    pools = {}
    for name, tr in (("single", tracker), ("sharded", sharded)):
        pool = StreamPool(tr, capacity=8, frame_hw=HW)
        pool.add(frames[0], [40, 30, 30, 40])
        pool.add(frames[0], [10, 10, 20, 20])
        outs = [pool.step(np.broadcast_to(f, (8, *HW, 3))) for f in frames[1:]]
        pools[name] = np.stack([np.asarray(o["bbox"][:2]) for o in outs])
    np.testing.assert_allclose(pools["sharded"], pools["single"], atol=1e-3)


# -- soak: randomized slot churn (VERDICT r3 #6) ----------------------------


def _churn_schedule(rng, capacity, steps):
    """Precomputed randomized add/remove schedule + per-slot frames, so the
    serial and pipelined runs replay EXACTLY the same events."""
    events = []
    for t in range(steps):
        events.append({
            "add": rng.rand() < 0.3,
            "add_bbox": [
                float(rng.randint(10, 60)), float(rng.randint(10, 50)),
                float(rng.randint(15, 40)), float(rng.randint(15, 40)),
            ],
            "remove_draw": rng.rand(),
            "remove_pick": int(rng.randint(1 << 30)),
            "frames": rng.randint(0, 255, (capacity, *HW, 3)).astype(np.float32),
        })
    return events


def _run_churn(tracker, events, capacity, pipeline_depth=0, dedicated=None):
    """Replay a churn schedule through a pool. With ``dedicated`` (a dict),
    every live slot is mirrored by its own 1-stream state on the same
    tracker; per-step active-slot bboxes are asserted equal — any template/
    bbox leakage across slot reuse breaks the mirror. With
    ``pipeline_depth`` > 0 results are drained that many steps late."""
    pool = StreamPool(tracker, capacity=capacity, frame_hw=HW)
    next_id = 0
    slot_owner = {}  # slot -> stream id
    results = []
    inflight = []

    def drain_one():
        out, active_owner = inflight.pop(0)
        res = out.result()
        results.append(res["bbox"].copy())
        if dedicated is not None:
            for slot, sid in active_owner.items():
                st, ded_out = tracker.step(dedicated[sid]["state"], dedicated[sid]["frame"][None])
                dedicated[sid]["state"] = st
                np.testing.assert_allclose(
                    res["bbox"][slot], np.asarray(ded_out["bbox"])[0], atol=1e-3,
                    err_msg=f"slot {slot} (stream {sid}) diverged from its dedicated mirror",
                )

    for ev in events:
        if ev["add"] and pool._free:
            claim = pool._free[0]  # slot add() will pop; its frame seeds the template
            slot = pool.add(ev["frames"][claim], ev["add_bbox"])
            assert slot == claim
            slot_owner[slot] = next_id
            if dedicated is not None:
                dedicated[next_id] = {
                    "state": tracker.init(
                        ev["frames"][slot][None], np.asarray([ev["add_bbox"]], np.float32)
                    ),
                    "frame": None,
                }
            next_id += 1
        if ev["remove_draw"] < 0.15 and pool.num_active > 0:
            active_slots = sorted(s for s in slot_owner if pool.active[s])
            victim = active_slots[ev["remove_pick"] % len(active_slots)]
            pool.remove(victim)
            sid = slot_owner.pop(victim)
            if dedicated is not None:
                dedicated.pop(sid)

        # bookkeeping invariants hold at every step
        assert pool.num_active + len(pool._free) == capacity
        assert not (set(np.nonzero(pool.active)[0]) & set(pool._free))

        if dedicated is not None:
            for slot, sid in slot_owner.items():
                dedicated[sid]["frame"] = ev["frames"][slot]
        handle = pool.step_async(ev["frames"])
        inflight.append((handle, {s: i for s, i in slot_owner.items() if pool.active[s]}))
        while len(inflight) > max(pipeline_depth, 0):
            drain_one()
    while inflight:
        drain_one()
    return results


def test_soak_slot_churn_isolation(tracker):
    """Hundreds of randomized add/remove/step events: per-slot trajectories
    must stay identical to dedicated single-stream mirrors (no template/bbox
    leakage when slots are reused), bookkeeping must never drift."""
    rng = np.random.RandomState(11)
    events = _churn_schedule(rng, capacity=4, steps=120)
    _run_churn(tracker, events, capacity=4, dedicated={})


def test_soak_pipelined_matches_serial(tracker):
    """The same churn schedule drained serially and with 2 steps in flight
    must produce identical outputs — the dispatch-time active-set snapshot
    keeps late drains correct under churn."""
    rng = np.random.RandomState(12)
    events = _churn_schedule(rng, capacity=4, steps=80)
    serial = _run_churn(tracker, events, capacity=4, pipeline_depth=0)
    piped = _run_churn(tracker, events, capacity=4, pipeline_depth=2)
    assert len(serial) == len(piped)
    for a, b in zip(serial, piped):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_soak_dual_template_churn_isolation(tracker):
    """Same churn soak with the dual-template update live (interval 1 — the
    pacing-independent cadence): the per-slot DYNAMIC template must also stay
    isolated across slot reuse."""
    dual = ScanTracker(
        tracker.model, tracker.variables, CFG,
        dynamic_template=True, update_mode="ema",
        update_threshold=-1.0,  # update every frame: maximal state churn
        update_rate=0.3, update_interval=1,
    )
    rng = np.random.RandomState(13)
    events = _churn_schedule(rng, capacity=3, steps=60)
    _run_churn(dual, events, capacity=3, dedicated={})


def test_soak_reinit_policy_churn(tracker):
    """Long chunked run under failure_policy='reinit' with slot churn: the
    pool must keep re-templating failing slots without state corruption, and
    inactive slots must never be re-templated."""
    rng = np.random.RandomState(14)
    pool = StreamPool(tracker, capacity=3, frame_hw=HW, failure_policy="reinit")
    pool.add(rng.randint(0, 255, (*HW, 3)).astype(np.float32), [40, 30, 30, 40])
    pool.add(rng.randint(0, 255, (*HW, 3)).astype(np.float32), [10, 10, 25, 25])
    reinits = 0
    for it in range(50):
        if it % 7 == 3 and pool.num_active > 1:
            pool.remove(int(np.nonzero(pool.active)[0][-1]))
        elif it % 7 == 5 and pool._free:
            pool.add(rng.randint(0, 255, (*HW, 3)).astype(np.float32), [20, 20, 30, 30])
        # blank chunks collapse confidence -> failures -> reinit path
        chunk = np.zeros((2, 3, *HW, 3), np.float32)
        before = np.asarray(pool.state.template_feats).copy()
        out = pool.step_chunk(chunk)
        after = np.asarray(pool.state.template_feats)
        failed = out["failure"].any(0)
        reinits += int((failed & pool.active).sum())
        for slot in range(3):
            if not pool.active[slot] and not failed[slot]:
                np.testing.assert_array_equal(
                    before[slot], after[slot],
                    err_msg=f"inactive slot {slot} was re-templated",
                )
        assert np.isfinite(np.asarray(pool.state.bbox)).all()
        assert pool.num_active + len(pool._free) == 3
    assert reinits > 0, "soak never exercised the reinit path"


def test_apce_output_matches_scoremap_shape(tracker):
    """The runtime's per-frame APCE diagnostic: right shape, finite,
    positive, and stacked over T by track()."""
    rng = np.random.RandomState(9)
    frames = np.stack([_frames(rng, 2) for _ in range(3)])
    b0 = np.array([[40, 30, 30, 40], [20, 20, 30, 30]], np.float32)
    st = tracker.init(frames[0], b0)
    st, out = tracker.step(st, frames[0])
    assert out["apce"].shape == (2,)
    st, out = tracker.track(st, frames)
    a = np.asarray(out["apce"])
    assert a.shape == (3, 2)
    assert np.all(np.isfinite(a)) and np.all(a > 0)
    # bounded by the closed-form single-peak maximum N = H·W cells
    assert np.all(a <= CFG.score_size ** 2 + 1e-3)


def test_recover_context_widens_window_after_low_confidence(tracker):
    """Zoom-out re-acquisition: a sub-threshold previous confidence widens
    the next search window for THAT stream only; confident streams and
    disabled recovery are bit-identical to the baseline."""
    rng = np.random.RandomState(11)
    frame = _frames(rng)[0]
    frames2 = np.broadcast_to(frame, (2, *HW, 3))
    b0 = np.array([[40, 30, 30, 40], [40, 30, 30, 40]], np.float32)

    rec = ScanTracker(tracker.model, tracker.variables, CFG,
                      recover_context=4.0, recover_threshold=0.5)
    st = tracker.init(frames2, b0)
    st_low = st._replace(confidence=jnp.asarray([0.0, 1.0], jnp.float32))

    _, base = tracker.step(st_low, frames2)
    _, out = rec.step(st_low, frames2)
    base_bbox, rec_bbox = np.asarray(base["bbox"]), np.asarray(out["bbox"])
    # identical inputs -> baseline treats both streams the same
    np.testing.assert_allclose(base_bbox[0], base_bbox[1], atol=1e-5)
    # confident stream unchanged by the recovery feature
    np.testing.assert_allclose(rec_bbox[1], base_bbox[1], atol=1e-5)
    # low-confidence stream saw a wider window -> different prediction
    assert not np.allclose(rec_bbox[0], base_bbox[0], atol=1e-3)

    # recover_context=0 disables the branch entirely
    off = ScanTracker(tracker.model, tracker.variables, CFG, recover_context=0.0)
    _, out_off = off.step(st_low, frames2)
    np.testing.assert_allclose(np.asarray(out_off["bbox"]), base_bbox, atol=1e-6)

    with pytest.raises(ValueError):
        ScanTracker(tracker.model, tracker.variables, CFG, recover_context=-1.0)


def test_multiobject_shared_frames_match_tiled(tracker):
    """Multi-object mode: rank-3 frames (one video, S objects) must be
    bit-identical to tiling the video across S streams host-side — init,
    chunked track, and single step."""
    rng = np.random.RandomState(7)
    T, S = 5, 3
    video = np.stack([_frames(rng)[0] for _ in range(T)])  # (T, H, W, 3)
    boxes = np.array(
        [[40, 30, 30, 40], [20, 20, 30, 30], [60, 50, 40, 30]], np.float32
    )

    tiled = np.broadcast_to(video[:, None], (T, S, *HW, 3)).copy()
    st_t = tracker.init(tiled[0], boxes)
    st_s = tracker.init(video[0], boxes)
    np.testing.assert_array_equal(
        np.asarray(st_s.template_feats), np.asarray(st_t.template_feats)
    )

    st_t, out_t = tracker.track(st_t, tiled[1:4])
    st_s, out_s = tracker.track(st_s, video[1:4])
    np.testing.assert_array_equal(np.asarray(out_s["bbox"]), np.asarray(out_t["bbox"]))
    np.testing.assert_array_equal(
        np.asarray(out_s["confidence"]), np.asarray(out_t["confidence"])
    )

    st_t, out_t = tracker.step(st_t, tiled[4])
    st_s, out_s = tracker.step(st_s, video[4])
    np.testing.assert_array_equal(np.asarray(out_s["bbox"]), np.asarray(out_t["bbox"]))


def test_multiobject_dynamic_template_and_recovery(tracker):
    """The shared-frame broadcast composes with the dual-template refresh
    (which re-crops the template from the shared frame) and the zoom-out
    recovery branch."""
    tr = ScanTracker(
        tracker.model, tracker.variables, CFG,
        dynamic_template=True, update_threshold=0.0,  # refresh every frame
        recover_context=4.0, recover_threshold=1.1,   # widen every frame
    )
    rng = np.random.RandomState(8)
    T, S = 4, 2
    video = np.stack([_frames(rng)[0] for _ in range(T)])
    boxes = np.array([[40, 30, 30, 40], [20, 20, 30, 30]], np.float32)
    tiled = np.broadcast_to(video[:, None], (T, S, *HW, 3)).copy()

    st_t = tr.init(tiled[0], boxes)
    st_s = tr.init(video[0], boxes)
    st_t, out_t = tr.track(st_t, tiled[1:])
    st_s, out_s = tr.track(st_s, video[1:])
    np.testing.assert_array_equal(np.asarray(out_s["bbox"]), np.asarray(out_t["bbox"]))
    np.testing.assert_array_equal(
        np.asarray(st_s.dyn_feats), np.asarray(st_t.dyn_feats)
    )


def test_pool_shared_frame_multiobject(tracker):
    """One camera, many objects: the pool accepts a single (H, W, 3) frame /
    (T, H, W, 3) chunk shared by every slot, equal to per-slot tiling —
    including the reinit policy's re-template source."""
    rng = np.random.RandomState(11)
    frames = [_frames(rng)[0] for _ in range(4)]

    def run(shared: bool):
        pool = StreamPool(tracker, capacity=3, frame_hw=HW, failure_policy="reinit")
        pool.add(frames[0], [40, 30, 30, 40])
        pool.add(frames[0], [20, 20, 30, 30])
        outs = []
        f1 = frames[1] if shared else np.broadcast_to(frames[1], (3, *HW, 3)).copy()
        outs.append(pool.step(f1))
        chunk = (np.stack(frames[2:]) if shared
                 else np.broadcast_to(np.stack(frames[2:])[:, None], (2, 3, *HW, 3)).copy())
        outs.append(pool.step_chunk(chunk))
        return outs, pool

    (o_s, p_s), (o_t, p_t) = run(True), run(False)
    for a, b in zip(o_s, o_t):
        np.testing.assert_array_equal(a["bbox"], b["bbox"])
        np.testing.assert_array_equal(a["failure"], b["failure"])
    np.testing.assert_array_equal(
        np.asarray(p_s.state.template_feats), np.asarray(p_t.state.template_feats)
    )
