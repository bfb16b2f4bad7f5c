"""Fused IR-block Pallas kernel + folded trunk: parity with the Flax model.

The kernel runs in interpreter mode on CPU (same convention as
test_pallas_decode.py); shapes cover stride-1/stride-2, k3/k5, with and
without expansion/residual.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feartracker_tpu.models.fbnet import IRBlockSpec, TINY_TRUNK
from feartracker_tpu.ops.fused_trunk import (
    fold_fear_net,
    fused_eligible,
    get_features_folded,
    xla_ir_block,
)
from feartracker_tpu.ops.pallas.ir_block import fused_ir_block


def _random_block(rng, cin, e, k, cout):
    ce = cin * e
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.25)
    return {
        "expand": None if e == 1 else {"w": mk(cin, ce), "b": mk(ce)},
        "dw": {"w": mk(k, k, ce), "b": mk(ce)},
        "project": {"w": mk(ce, cout), "b": mk(cout)},
    }


@pytest.mark.parametrize(
    "cin,e,k,s,cout,H",
    [
        (16, 6, 3, 2, 24, 32),   # FEAR-XS block1 shape family
        (24, 6, 5, 2, 32, 32),   # block4
        (32, 6, 5, 2, 64, 32),   # block8
        (32, 6, 5, 1, 32, 16),   # residual stride-1
        (112, 3, 5, 1, 112, 16),  # block15
        (32, 6, 3, 1, 32, 16),   # k3 stride-1
        (16, 2, 3, 2, 12, 32),   # TINY_TRUNK block1
    ],
)
def test_fused_block_matches_xla(cin, e, k, s, cout, H):
    rng = np.random.RandomState(0)
    spec = IRBlockSpec(e, k, s, cout)
    blk = _random_block(rng, cin, e, k, cout)
    x = jnp.asarray(rng.randn(2, H, H, cin).astype(np.float32))
    ref = xla_ir_block(x, blk, spec)
    got = fused_ir_block(x, blk, spec, interpret=True)
    assert got.shape == (2, H // s, H // s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_block_bf16_runs():
    rng = np.random.RandomState(1)
    spec = IRBlockSpec(6, 5, 1, 32)
    blk = _random_block(rng, 32, 6, 5, 32)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    ref = np.asarray(xla_ir_block(x.astype(jnp.bfloat16), blk, spec), np.float32)
    got = np.asarray(fused_ir_block(x.astype(jnp.bfloat16), blk, spec, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.15)  # bf16 association differences


def test_fold_and_folded_features_match_flax():
    from feartracker_tpu.models.fear_net import FEARNet

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    rng = np.random.RandomState(2)
    v = model.init(
        jax.random.PRNGKey(0),
        (np.zeros((1, 32, 32, 3), np.float32), np.zeros((1, 64, 64, 3), np.float32)),
        train=False,
    )
    # non-trivial running stats so the BN fold is actually exercised
    stats = jax.tree.map(
        lambda a: a + jnp.abs(jnp.asarray(rng.rand(*a.shape), jnp.float32)) * 0.5,
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": stats}
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = model.apply(v, x, method=model.get_features)
    folded = fold_fear_net(v, TINY_TRUNK)
    for impl in ("xla", "fused"):
        got = get_features_folded(x, folded, TINY_TRUNK, impl=impl, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_eligibility_gate():
    e6 = IRBlockSpec(6, 5, 1, 32)
    assert fused_eligible(e6, (4, 16, 16, 32), jnp.bfloat16)
    assert not fused_eligible(IRBlockSpec(1, 3, 1, 16), (4, 16, 16, 16), jnp.bfloat16)  # e=1
    assert not fused_eligible(e6, (4, 8, 8, 32), jnp.bfloat16)  # W below sublane tile
    assert fused_eligible(e6, (4, 8, 8, 32), jnp.float32)  # f32 sublane is 8
    s2 = IRBlockSpec(6, 5, 2, 64)
    assert fused_eligible(s2, (4, 32, 32, 32), jnp.bfloat16)
    assert not fused_eligible(s2, (4, 16, 16, 32), jnp.bfloat16)  # planes W/2=8


def test_scan_tracker_fused_matches_xla():
    from feartracker_tpu.models.fear_net import FEARNet
    from feartracker_tpu.tracker.runtime import ScanTracker

    model = FEARNet(trunk_blocks=TINY_TRUNK, adjust_channels=16, towernum=1)
    rng = np.random.RandomState(3)
    v = model.init(
        jax.random.PRNGKey(0),
        (np.zeros((1, 32, 32, 3), np.float32), np.zeros((1, 64, 64, 3), np.float32)),
        train=False,
    )
    from feartracker_tpu.tracker.config import TrackerConfig

    # TINY_TRUNK output stride is 8: search 64 → 8×8 score map
    cfg = TrackerConfig(template_size=32, instance_size=64, score_size=8, total_stride=8)
    frames0 = rng.randint(0, 255, (2, 96, 128, 3), np.uint8)
    chunk = rng.randint(0, 255, (3, 2, 96, 128, 3), np.uint8)
    boxes = np.array([[40.0, 30, 30, 24], [60, 20, 24, 30]], np.float32)

    results = {}
    for impl in ("xla", "fused"):
        tr = ScanTracker(model, v, cfg, trunk_impl=impl)
        state = tr.init(frames0, boxes)
        _, outs = tr.track(state, chunk)
        results[impl] = np.asarray(outs["bbox"])
    np.testing.assert_allclose(results["fused"], results["xla"], atol=1e-3)


def test_kernel_utility_math():
    """Pure helpers: sublane tiles, VMEM estimates, chunk sizing, s_tile picking."""
    from feartracker_tpu.ops.pallas.ir_block import (
        _chunk_rows,
        estimate_vmem,
        pick_s_tile,
        sublane_tile,
    )

    assert sublane_tile(jnp.float32) == 8
    assert sublane_tile(jnp.bfloat16) == 16
    assert sublane_tile(jnp.int8) == 32

    # chunk size always divides the total and respects the budget
    for total in (16, 32, 64, 50):
        c = _chunk_rows(2, 64, 384, total)
        assert total % c == 0 and c >= 1

    # estimates grow monotonically with the stream tile
    args = (32, 32, 32, 192, 64, 5, 1, jnp.bfloat16)
    assert estimate_vmem(2, *args) < estimate_vmem(4, *args) < estimate_vmem(8, *args)

    # picked tile divides S and fits the budget; oversized blocks return 0
    st = pick_s_tile(128, 16, 16, 112, 672, 112, 5, 1, jnp.bfloat16)
    assert st > 0 and 128 % st == 0
    assert pick_s_tile(128, 256, 256, 64, 384, 64, 5, 1, jnp.float32) == 0


def test_pack_expand_weights_block_diagonal():
    from feartracker_tpu.ops.pallas.ir_block import _pad_up, pack_expand_weights

    rng = np.random.RandomState(0)
    we = jnp.asarray(rng.randn(24, 144).astype(np.float32))
    be = jnp.asarray(rng.randn(144).astype(np.float32))
    w4, b4 = pack_expand_weights(we, be)
    cpad = _pad_up(144, 128)
    assert w4.shape == (96, 4 * cpad) and b4.shape == (1, 4 * cpad)
    for r in range(4):
        blk = w4[r * 24 : (r + 1) * 24, r * cpad : r * cpad + 144]
        np.testing.assert_array_equal(np.asarray(blk), np.asarray(we))
        np.testing.assert_array_equal(
            np.asarray(b4[0, r * cpad : r * cpad + 144]), np.asarray(be)
        )
    # everything off the diagonal blocks is zero
    total = float(jnp.abs(w4).sum())
    diag = 4 * float(jnp.abs(we).sum())
    assert abs(total - diag) < 1e-4
