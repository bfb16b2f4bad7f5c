"""Pallas fused decode kernel vs the XLA postprocess (interpret mode on CPU;
the real-TPU numeric check runs in bench/driver)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.core import postprocess as pp
from feartracker_tpu.ops.pallas.decode import postprocess_pallas


@pytest.mark.parametrize("smooth", [False, True])
def test_pallas_decode_matches_xla(smooth):
    rng = np.random.RandomState(0)
    S = 3
    reg = jnp.asarray(np.abs(rng.rand(S, 16, 16, 4)).astype(np.float32) * 40 + 4)
    logits = jnp.asarray(rng.randn(S, 16, 16, 1).astype(np.float32))
    prev = jnp.asarray(rng.uniform(20, 80, (S, 2)).astype(np.float32))

    cfg = pp.PostprocessConfig(smooth=smooth)
    ref = pp.postprocess(logits, reg, cfg, prev_size=prev)
    ours = postprocess_pallas(logits, reg, cfg, prev_size=prev, interpret=True)
    np.testing.assert_allclose(np.asarray(ours.bbox), np.asarray(ref.bbox), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.confidence), np.asarray(ref.confidence), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours.pred_coords), np.asarray(ref.pred_coords))


def test_pallas_decode_tiebreak_row_major():
    # two identical peaks → must pick the first in row-major order
    cls = np.full((1, 16, 16, 1), -5.0, np.float32)
    cls[0, 4, 9, 0] = 3.0
    cls[0, 11, 2, 0] = 3.0
    reg = np.ones((1, 16, 16, 4), np.float32)
    res = postprocess_pallas(
        jnp.asarray(cls), jnp.asarray(reg), pp.PostprocessConfig(smooth=False), interpret=True
    )
    assert np.asarray(res.pred_coords)[0].tolist() == [4, 9]
