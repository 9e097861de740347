"""Toy datasets + density visualization (SURVEY.md §2.4 standalone
utilities)."""

import numpy as np
import pytest

from indm_tpu.utils import toy_data as td


@pytest.mark.parametrize("name", td.TOY_DATASETS)
def test_toy_dataset_shapes(name):
  rng = np.random.default_rng(0)
  x = td.inf_train_gen(name, 64, rng=rng)
  assert x.shape == (64, 2) or x.shape[1] == 2  # pinwheel rounds to class mult
  assert x.dtype == np.float32
  assert np.isfinite(x).all()
  assert np.abs(x).max() < 20


def test_toy_dataset_reproducible():
  a = td.inf_train_gen("8gaussians", 32, rng=np.random.default_rng(7))
  b = td.inf_train_gen("8gaussians", 32, rng=np.random.default_rng(7))
  np.testing.assert_array_equal(a, b)


def test_density_png(tmp_path):
  logp = lambda pts: -0.5 * (pts ** 2).sum(1)  # standard normal (unnorm.)
  path = td.save_density_png(str(tmp_path / "d.png"), logp, npts=32)
  from PIL import Image
  img = np.asarray(Image.open(path))
  assert img.shape == (32, 32)
  # mode at the center
  assert img[16, 16] == 255
