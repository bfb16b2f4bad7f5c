"""Native C++ crop engine: parity with the device (JAX) crop op and with the
cv2 host path, plus batch/threading behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from feartracker_tpu import native
from feartracker_tpu.ops.crop import crop_resize

needs_native = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@needs_native
def test_matches_device_crop_op():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    window = np.array([20.0, 10.0, 90.0, 80.0], np.float32)
    pad = np.array([100.0, 120.0, 140.0], np.float32)

    ours = native.crop_resize_normalize(frame, window, 64, pad)
    dev = np.asarray(crop_resize(jnp.asarray(frame, jnp.float32), jnp.asarray(window), 64, jnp.asarray(pad)))
    np.testing.assert_allclose(ours, dev, atol=1e-3)


@needs_native
def test_out_of_frame_window_uses_pad():
    frame = np.full((50, 50, 3), 200, np.uint8)
    pad = np.array([10.0, 20.0, 30.0], np.float32)
    # window fully outside → constant pad color
    out = native.crop_resize_normalize(frame, np.array([100.0, 100.0, 40.0, 40.0], np.float32), 16, pad)
    np.testing.assert_allclose(out.reshape(-1, 3), np.tile(pad, (16 * 16, 1)), atol=1e-4)


@needs_native
def test_normalization_applied():
    frame = np.full((40, 40, 3), 128, np.uint8)
    pad = np.full(3, 128.0, np.float32)
    mean = np.array([128.0, 0.0, 64.0], np.float32)
    std = np.array([2.0, 128.0, 1.0], np.float32)
    out = native.crop_resize_normalize(frame, np.array([0.0, 0.0, 40.0, 40.0], np.float32), 8, pad, mean, std)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 2], 64.0, atol=1e-4)


@needs_native
def test_batch_matches_single_and_threads():
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (6, 80, 100, 3), dtype=np.uint8)
    windows = np.stack(
        [np.array([5.0 * i - 10, 3.0 * i, 60.0 + i, 50.0 + i], np.float32) for i in range(6)]
    )
    pads = rng.rand(6, 3).astype(np.float32) * 255

    batch = native.crop_resize_normalize_batch(frames, windows, 32, pads, num_threads=4)
    for i in range(6):
        single = native.crop_resize_normalize(frames[i], windows[i], 32, pads[i])
        np.testing.assert_array_equal(batch[i], single)
