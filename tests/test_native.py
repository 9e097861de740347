"""Native (C++) data loader: build, correctness vs numpy reference,
determinism, and fallback (SURVEY.md §2.3 native-layer parity)."""

import numpy as np
import pytest

from indm_tpu import native


@pytest.fixture(scope="module")
def lib():
  lib = native.get_lib()
  if lib is None:
    pytest.skip("native toolchain unavailable")
  return lib


def test_gather_normalize_matches_numpy(lib):
  rng = np.random.default_rng(0)
  data = rng.integers(0, 255, (32, 8, 8, 3), dtype=np.uint8)
  idx = rng.integers(0, 32, size=10)
  out = native.fill_batch(data, idx, seed=7)
  np.testing.assert_allclose(out, data[idx].astype(np.float32) / 255.0,
                             atol=1e-7)


def test_flip_is_horizontal_and_deterministic(lib):
  rng = np.random.default_rng(1)
  data = rng.integers(0, 255, (4, 6, 6, 3), dtype=np.uint8)
  idx = np.arange(4)
  a = native.fill_batch(data, idx, seed=3, random_flip=True)
  b = native.fill_batch(data, idx, seed=3, random_flip=True)
  np.testing.assert_array_equal(a, b)  # same seed -> same flips
  plain = data[idx].astype(np.float32) / 255.0
  for i in range(4):
    ok = (np.allclose(a[i], plain[i])
          or np.allclose(a[i], plain[i, :, ::-1]))
    assert ok, "output must be the image or its horizontal mirror"
  # different seed eventually differs (flip pattern changes)
  c = native.fill_batch(data, idx, seed=4, random_flip=True)
  assert not np.array_equal(a, c) or True  # non-flaky: just exercise path


def test_dequant_and_center_ranges(lib):
  data = np.zeros((2, 4, 4, 3), np.uint8)
  data[1] = 255
  idx = np.array([0, 1])
  out = native.fill_batch(data, idx, seed=0, dequantize=True)
  # (pixel + u)/256 with u in [0,1): zeros -> [0, 1/256), 255 -> [255/256, 1)
  assert (out[0] >= 0).all() and (out[0] < 1 / 256 + 1e-6).all()
  assert (out[1] >= 255 / 256 - 1e-6).all() and (out[1] < 1.0).all()
  cen = native.fill_batch(data, idx, seed=0, dequantize=True, centered=True)
  np.testing.assert_allclose(cen, out * 2 - 1, atol=1e-6)


def test_epoch_iterator_uses_native_path(lib):
  from indm_tpu import data as data_lib
  data = np.random.default_rng(0).integers(0, 255, (64, 8, 8, 3),
                                           dtype=np.uint8)
  it = data_lib.EpochIterator(data, batch_size=16, shuffle=True,
                              random_flip=True, repeat=True, seed=0)
  b = next(it)
  assert b.shape == (16, 8, 8, 3) and b.dtype == np.float32
  assert 0.0 <= b.min() and b.max() <= 1.0
  it.close()
