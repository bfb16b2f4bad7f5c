"""Device crop engine tests: gather vs separable-matmul formulations, and
parity with the cv2 host path."""

import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu.data.crops import get_extended_crop
from feartracker_tpu.ops.crop import (
    crop_bbox_in_window,
    crop_resize,
    crop_resize_mm,
    extended_crop_window,
)

WINDOWS = [
    [20.0, 10.0, 90.0, 80.0],     # inside
    [-30.0, -20.0, 100.0, 90.0],  # over top-left corner
    [100.0, 80.0, 120.0, 100.0],  # over bottom-right
    [200.0, 200.0, 50.0, 50.0],   # fully outside
]


@pytest.fixture(scope="module")
def frame():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 255, (120, 160, 3)).astype(np.float32))


@pytest.mark.parametrize("win", WINDOWS)
def test_mm_matches_gather(frame, win):
    pad = jnp.asarray([100.0, 120.0, 140.0])
    a = np.asarray(crop_resize(frame, jnp.asarray(win), 64, pad))
    b = np.asarray(crop_resize_mm(frame, jnp.asarray(win), 64, pad))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_fully_outside_is_pad_color(frame):
    pad = jnp.asarray([7.0, 8.0, 9.0])
    out = np.asarray(crop_resize_mm(frame, jnp.asarray([500.0, 500.0, 40.0, 40.0]), 16, pad))
    np.testing.assert_allclose(out.reshape(-1, 3), np.tile([7, 8, 9], (256, 1)), atol=1e-4)


def test_device_crop_matches_cv2_host_path():
    """Same context window → device crop ≈ cv2 crop+pad+resize (cv2 uses
    fixed-point bilinear on uint8: allow 2 LSB)."""
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (100, 140, 3), dtype=np.uint8)
    bbox = np.array([40, 30, 30, 40])
    pad = np.array([90.0, 100.0, 110.0])

    host_crop, _, window = get_extended_crop(image, bbox, 64, 1.0, pad)
    dev = np.asarray(
        crop_resize_mm(
            jnp.asarray(image, jnp.float32),
            jnp.asarray(window, jnp.float32),
            64,
            jnp.asarray(pad, jnp.float32),
        )
    )
    assert np.abs(dev - host_crop.astype(np.float32)).max() <= 2.0


def test_extended_window_matches_host_extend_bbox():
    from feartracker_tpu.core.geometry import extend_bbox

    bbox = np.array([163.0, 53.0, 45.0, 174.0])
    dev = np.asarray(extended_crop_window(jnp.asarray(bbox), 2.0))
    host = extend_bbox(bbox, 2.0)
    np.testing.assert_array_equal(dev, host.astype(np.float64))


def test_crop_bbox_in_window_roundtrip():
    window = jnp.asarray([100.0, 50.0, 512.0, 512.0])
    bbox = jnp.asarray([228.0, 178.0, 64.0, 64.0])
    out = np.asarray(crop_bbox_in_window(bbox, window, 256))
    np.testing.assert_allclose(out, [64.0, 64.0, 32.0, 32.0])
