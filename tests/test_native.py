"""Native clip-assembly kernel vs numpy-oracle equivalence + speed sanity."""

import numpy as np
import pytest

from dvdgan_tpu import native


def _numpy_oracle(frames, t, size, start):
    t0, h, w, _ = frames.shape
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    sel = (start + np.arange(t)) % t0
    clip = frames[sel, y0:y0 + s, x0:x0 + s].astype(np.float32) / 255.0
    idx = np.minimum((np.arange(size) * s) // size, s - 1)
    clip = clip[:, idx][:, :, idx]
    return 2.0 * clip - 1.0


def test_native_builds():
    assert native.available(), "g++ build of libclipops.so failed"


@pytest.mark.parametrize("shape,t,size,start", [
    ((10, 48, 64, 3), 4, 32, 2),     # rectangular, downresize
    ((6, 64, 64, 3), 6, 64, 0),      # identity size
    ((3, 32, 32, 3), 8, 16, 1),      # wrap-around window (loop pad)
    ((5, 17, 23, 3), 2, 8, 4),       # odd sizes
])
def test_native_matches_numpy(shape, t, size, start):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, shape, dtype=np.uint8)
    got = native.clip_window(frames, t, size, start)
    want = _numpy_oracle(frames, t, size, start)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-6)


def test_native_range_and_dtype():
    frames = np.zeros((4, 16, 16, 3), np.uint8)
    frames[..., 0] = 255
    out = native.clip_window(frames, 4, 8, 0)
    assert out.dtype == np.float32
    assert np.allclose(out[..., 0], 1.0) and np.allclose(out[..., 1], -1.0)
