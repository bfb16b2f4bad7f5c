import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.core import box_coder as bc
from feartracker_tpu.core import postprocess as pp
from feartracker_tpu.core.grids import make_grid_np

SPEC = bc.BoxCoderSpec(score_size=16, total_stride=16, instance_size=256)


def test_make_grid_values():
    gx, gy = make_grid_np(16, 16, 256)
    # grid = (idx - 8) * 16 + 128 (ref utils.py:190-196)
    assert gx[0, 0] == (0 - 8) * 16 + 128 == 0
    assert gx[0, 15] == (15 - 8) * 16 + 128 == 240
    assert gy[5, 3] == (5 - 8) * 16 + 128
    assert gx[3, 5] == (5 - 8) * 16 + 128
    assert gx.shape == (16, 16)


def test_encode_centered_box_positive_center():
    # box centered at (128,128) with size 64 -> center cells positive
    bboxes = jnp.array([[96.0, 96.0, 64.0, 64.0]])
    enc = bc.encode(bboxes, SPEC)
    assert enc.regression_map.shape == (1, 16, 16, 4)
    assert enc.classification_label.shape == (1, 16, 16, 1)
    cls = np.asarray(enc.classification_label)[0, :, :, 0]
    # grid cell (8,8) is at pixel (128,128), strictly inside
    assert cls[8, 8] == 1.0
    assert cls[0, 0] == 0.0
    # positive cells: grid coords strictly inside (96,96)-(160,160):
    # pixels 112,128,144 → rows/cols 7,8,9
    assert cls.sum() == 9


def test_encode_ltrb_values():
    bboxes = jnp.array([[96.0, 96.0, 64.0, 64.0]])
    reg = np.asarray(bc.encode(bboxes, SPEC).regression_map)[0]
    # at cell (8,8): grid=(128,128) → l = 128-96 = 32, t = 32, r = 96+64-128=32, b=32
    assert reg[8, 8].tolist() == [32.0, 32.0, 32.0, 32.0]


def test_encode_decode_roundtrip():
    bboxes = jnp.array([[96.0, 96.0, 64.0, 64.0], [40.0, 56.0, 100.0, 80.0]])
    enc = bc.encode(bboxes, SPEC)
    dec = bc.decode(enc.regression_map, enc.classification_label, SPEC, use_sigmoid=False)
    # regression map is exact everywhere → decoded box matches input exactly
    np.testing.assert_allclose(np.asarray(dec.bbox), np.asarray(bboxes), atol=1e-5)


def test_decode_argmax_row_major_tiebreak():
    # two equal peaks: flattened argmax must pick the first in row-major order
    cls = np.zeros((1, 16, 16), np.float32)
    cls[0, 3, 10] = 1.0
    cls[0, 7, 2] = 1.0
    reg = np.zeros((1, 16, 16, 4), np.float32)
    dec = bc.decode(jnp.asarray(reg), jnp.asarray(cls), SPEC, use_sigmoid=False)
    assert dec.pred_coords[0].tolist() == [3, 10]


def test_decode_batched_matches_loop():
    rng = np.random.RandomState(0)
    reg = rng.rand(4, 16, 16, 4).astype(np.float32) * 50
    cls = rng.rand(4, 16, 16).astype(np.float32)
    dec = bc.decode(jnp.asarray(reg), jnp.asarray(cls), SPEC, use_sigmoid=False)
    gx, gy = make_grid_np(16, 16, 256)
    for i in range(4):
        r, c = np.unravel_index(cls[i].argmax(), (16, 16))
        x1 = gx[r, c] - reg[i, r, c, 0]
        y1 = gy[r, c] - reg[i, r, c, 1]
        x2 = gx[r, c] + reg[i, r, c, 2]
        y2 = gy[r, c] + reg[i, r, c, 3]
        np.testing.assert_allclose(
            np.asarray(dec.bbox)[i], [x1, y1, x2 - x1, y2 - y1], atol=1e-5
        )
        assert dec.pred_coords[i].tolist() == [r, c]


def _np_reference_penalty(cls_score, reg, prev_size, cfg):
    """Independent numpy transliteration of base_tracker.py:166-205."""
    gx, gy = make_grid_np(cfg.score_size, cfg.total_stride, cfg.instance_size)
    x1, y1 = gx - reg[..., 0], gy - reg[..., 1]
    x2, y2 = gx + reg[..., 2], gy + reg[..., 3]
    w, h = x2 - x1, y2 - y1

    def ssz(w, h):
        pad = (w + h) * 0.5
        return np.sqrt((w + pad) * (h + pad))

    def lim(r):
        return np.maximum(r, 1.0 / r)

    s_c = lim(ssz(w, h) / ssz(prev_size[0], prev_size[1]))
    r_c = lim((prev_size[0] / prev_size[1]) / (w / h))
    penalty = np.exp(-(r_c * s_c - 1) * cfg.penalty_k)
    pscore = penalty * cls_score
    win = np.outer(np.hanning(cfg.score_size), np.hanning(cfg.score_size))
    pscore = pscore * (1 - cfg.window_influence) + win * cfg.window_influence
    return pscore, penalty


def test_penalty_scores_match_numpy_oracle():
    cfg = pp.PostprocessConfig(smooth=True)
    rng = np.random.RandomState(1)
    reg = np.abs(rng.rand(1, 16, 16, 4).astype(np.float32)) * 40 + 5
    cls = rng.rand(1, 16, 16).astype(np.float32)
    prev = np.array([[60.0, 45.0]], np.float32)
    ps, pen = pp.penalty_scores(jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(prev), cfg)
    ps_ref, pen_ref = _np_reference_penalty(cls[0], reg[0], prev[0], cfg)
    np.testing.assert_allclose(np.asarray(ps)[0], ps_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pen)[0], pen_ref, rtol=1e-5)


def test_smooth_size_formula():
    # replicate base_tracker.py:126-139 exactly
    pred = jnp.array([[100.0, 50.0]])
    prev = jnp.array([[80.0, 40.0]])
    lr = jnp.array([0.3])
    out = np.asarray(pp.smooth_size(pred, prev, lr))[0]
    exp_w = 80 * 0.7 + 0.3 * (100 * 0.3 + 80 * 0.7)
    exp_h = 40 * 0.7 + 0.3 * (50 * 0.3 + 40 * 0.7)
    np.testing.assert_allclose(out, [exp_w, exp_h], rtol=1e-6)


def test_postprocess_no_smooth_is_plain_argmax():
    cfg = pp.PostprocessConfig(smooth=False)
    rng = np.random.RandomState(2)
    reg = np.abs(rng.rand(2, 16, 16, 4).astype(np.float32)) * 40
    logits = rng.randn(2, 16, 16, 1).astype(np.float32)
    res = pp.postprocess(jnp.asarray(logits), jnp.asarray(reg), cfg)
    dec = bc.decode(jnp.asarray(reg), jnp.asarray(logits[..., 0]), SPEC, use_sigmoid=True)
    np.testing.assert_allclose(np.asarray(res.bbox), np.asarray(dec.bbox), atol=1e-5)
    # confidence equals sigmoid logit at peak
    sig = 1 / (1 + np.exp(-logits[..., 0]))
    for i in range(2):
        r, c = np.asarray(res.pred_coords)[i]
        assert np.asarray(res.confidence)[i] == pytest.approx(sig[i, r, c], rel=1e-5)


def test_postprocess_smooth_jits():
    cfg = pp.PostprocessConfig(smooth=True)
    fn = jax.jit(lambda l, r, p: pp.postprocess(l, r, cfg, p))
    rng = np.random.RandomState(3)
    reg = jnp.asarray(np.abs(rng.rand(1, 16, 16, 4).astype(np.float32)) * 40 + 4)
    logits = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    prev = jnp.asarray(np.array([[50.0, 50.0]], np.float32))
    res = fn(logits, reg, prev)
    assert res.bbox.shape == (1, 4)
    assert np.all(np.isfinite(np.asarray(res.bbox)))


def test_apce_sharp_peak_beats_flat_and_bimodal():
    # APCE is amplitude-invariant map *shape*: single sharp peak → high; a
    # second equal mode halves it (energy doubles, peak unchanged); a
    # structureless noise map → low (uniform noise ≈ 3, the range²/3 energy)
    sharp = np.full((1, 16, 16), 0.1, np.float32)
    sharp[0, 4, 5] = 0.9
    bimodal = sharp.copy()
    bimodal[0, 12, 11] = 0.9
    noise = np.random.RandomState(0).rand(1, 16, 16).astype(np.float32)
    a_sharp, a_bi, a_noise = (
        float(pp.apce(jnp.asarray(m))[0]) for m in (sharp, bimodal, noise)
    )
    assert a_sharp > a_bi * 1.8
    assert a_bi > a_noise
    assert a_noise == pytest.approx(3.0, rel=0.35)
    # closed form for one peak cell out of N: (d²)/(d²/N) = N
    assert a_sharp == pytest.approx(256.0, rel=1e-4)
