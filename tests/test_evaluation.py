"""FID/IS/KID math + metric pipeline tests (mock-weight Inception)."""

import numpy as np
import pytest

from indm_tpu.metrics import (compute_statistics, frechet_distance,
                              inception_score, kernel_distance)
from indm_tpu.metrics.fid import frechet_distance_newton_schulz


def test_frechet_distance_identical_is_zero():
  rng = np.random.default_rng(0)
  f = rng.normal(size=(500, 16))
  mu, sigma = compute_statistics(f)
  assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_analytic_mean_shift():
  """For equal covariances, FID = ||mu1 - mu2||^2."""
  rng = np.random.default_rng(1)
  f = rng.normal(size=(2000, 8))
  mu, sigma = compute_statistics(f)
  mu2 = mu + 1.0
  got = frechet_distance(mu, sigma, mu2, sigma)
  np.testing.assert_allclose(got, 8.0, rtol=1e-6)


def test_newton_schulz_matches_scipy():
  rng = np.random.default_rng(2)
  a = rng.normal(size=(300, 12))
  b = rng.normal(size=(300, 12)) * 1.5 + 0.3
  mu1, s1 = compute_statistics(a)
  mu2, s2 = compute_statistics(b)
  want = frechet_distance(mu1, s1, mu2, s2)
  got = float(frechet_distance_newton_schulz(mu1, s1, mu2, s2,
                                             num_iters=50))
  np.testing.assert_allclose(got, want, rtol=1e-3)


def test_kid_zero_for_same_distribution():
  rng = np.random.default_rng(3)
  f1 = rng.normal(size=(800, 16))
  f2 = rng.normal(size=(800, 16))
  kid = kernel_distance(f1, f2, num_subsets=20, max_subset_size=200)
  assert abs(kid) < 0.5
  f3 = rng.normal(size=(800, 16)) + 2.0
  kid_far = kernel_distance(f1, f3, num_subsets=20, max_subset_size=200)
  assert kid_far > 10 * abs(kid)


def test_inception_score_uniform_vs_peaked():
  n, k = 256, 10
  uniform_logits = np.zeros((n, k))
  assert abs(inception_score(uniform_logits) - 1.0) < 1e-4
  peaked = np.full((n, k), -50.0)
  peaked[np.arange(n), np.arange(n) % k] = 50.0
  s = inception_score(peaked)
  assert s > 5.0


@pytest.mark.slow
def test_inception_feature_pipeline_tiny():
  """Exercise the full InceptionV3 graph with mock weights on tiny inputs."""
  from indm_tpu.metrics import inception as inception_lib
  params = inception_lib.random_params()
  extract = inception_lib.feature_extractor(params, batch_size=4)
  imgs = np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
  pool, logits = extract(imgs)
  assert pool.shape == (4, 2048)
  assert logits.shape == (4, 1008)
  assert np.isfinite(pool).all()
