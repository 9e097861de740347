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


# ---------------------------------------------------------------------------
# bpd harness (`evaluation.py:388-495` parity)
# ---------------------------------------------------------------------------


def _harness_setup(tmp_path, **overrides):
  import jax
  from indm_tpu import data as data_lib
  from indm_tpu import run_lib
  from indm_tpu import sde as sde_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.models import create_model, get_score_fn

  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.flow.model = "identity"
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.eval.batch_size = 64
  cfg.eval.num_nelbo = 1
  cfg.datadir = str(tmp_path)
  for k, v in overrides.items():
    node, leaf = k.split(".")
    setattr(getattr(cfg, node), leaf, v)

  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  sde = sde_lib.get_sde(cfg)
  scaler = data_lib.get_data_scaler(cfg)
  inverse_scaler = data_lib.get_data_inverse_scaler(cfg)
  opt = state_lib.make_optimizer(cfg)
  _, nll_fn, nelbo_fn, _ = run_lib.get_loss_fns(
      cfg, sde, inverse_scaler, module, None, opt, None, train=False)
  score_fn = get_score_fn(cfg, sde, module, variables, train=False,
                          continuous=True)
  _, eval_ds = data_lib.get_dataset(cfg, evaluation=True)
  return cfg, eval_ds, scaler, nelbo_fn, nll_fn, score_fn


@pytest.mark.slow
def test_bpd_harness_all_four_sections(tmp_path, caplog):
  """eval.truncation_time override + the 'NLL correct w/ eps = training
  truncation_time' fourth pass (`/root/reference/evaluation.py:437-493`)."""
  import logging
  from indm_tpu import evaluation

  cfg, eval_ds, scaler, nelbo_fn, nll_fn, score_fn = _harness_setup(
      tmp_path,
      **{"training.truncation_time": 1e-4,   # != 1e-5 -> fourth pass
         "eval.truncation_time": 1e-3,       # honored eps override
         "eval.skip_nll_wrong": False})
  with caplog.at_level(logging.INFO):
    results = evaluation.get_bpd(cfg, eval_ds, scaler, nelbo_fn, nll_fn,
                                 score_fn, None, step=0, eval=True)
  eval_ds.close()
  assert {"nelbo", "nelbo_residual", "nll_wrong", "nll_correct",
          "nll_correct_train_eps"} <= set(results)
  assert all(np.isfinite(v) for v in results.values())
  # the eps override (1e-3, not the training 1e-4 / default 1e-5) is used
  assert "NLL WRONG w/ eps=1.0e-03" in caplog.text
  assert "NLL CORRECT w/ eps=1.0e-03" in caplog.text
  assert "NLL CORRECT w/ eps=eps" in caplog.text


def _identifying_stubs(cfg):
  """nelbo/nll stubs whose per-example 'bpd' is the image's uint8 value,
  recovered exactly from the dequantized batch: 256*x01 in [k, k+1) for
  source byte k, so floor() inverts the dequantization."""
  import jax.numpy as jnp
  from indm_tpu import data as data_lib

  inverse_scaler = data_lib.get_data_inverse_scaler(cfg)

  def recover(b):
    x01 = inverse_scaler(b)
    return jnp.mean(jnp.floor(256.0 * x01), axis=(1, 2, 3))

  def nelbo_fn(rng, score_fn, flow_forward_fn, b):
    return recover(b), recover(b)

  def nll_fn(rng, score_fn, flow_forward_fn, b, residual=False,
             eps_bpd=1e-5):
    return recover(b), b, jnp.asarray(1, jnp.int32)

  return nelbo_fn, nll_fn


def test_bpd_sections_see_identical_images_in_reference_order(tmp_path):
  """All four bpd sections must restart the test set from the start and see
  the SAME images in the SAME deterministic order, as the reference's
  per-section `iter(tf_ds)` does (`/root/reference/evaluation.py:400-493`).
  The dataset is 10 images whose value IS their index; with epoch-start
  restarts every section averages images 0..7 -> 3.5, while a mid-stream
  continuation would average a shifted window."""
  from indm_tpu import evaluation

  data = np.stack([np.full((8, 8, 3), i, np.uint8) for i in range(10)])
  np.savez_compressed(tmp_path / "cifar10.npz", train=data, test=data)
  cfg, eval_ds, scaler, _, _, score_fn = _harness_setup(
      tmp_path, **{"eval.num_test_data": 6, "eval.batch_size": 8,
                   "eval.skip_nll_wrong": False,
                   "training.truncation_time": 1e-4})
  nelbo_fn, nll_fn = _identifying_stubs(cfg)
  results = evaluation.get_bpd(cfg, eval_ds, scaler, nelbo_fn, nll_fn,
                               score_fn, None, step=0, eval=True)
  eval_ds.close()
  # one batch of 8 -> images 0..7 from the epoch start, per section
  want = float(np.arange(8).mean())
  for key in ("nelbo", "nll_wrong", "nll_correct", "nll_correct_train_eps"):
    assert results[key] == pytest.approx(want), (key, results)


def test_bpd_in_training_small_real_dataset_warns_and_caps(tmp_path, caplog):
  """In-training (eval=False) bpd on a real dataset smaller than the
  hardcoded 10000 must cap and continue (the reference's tf.data get_batch
  self-heals), not crash training at the first preemption snapshot."""
  import logging
  from indm_tpu import evaluation

  data = np.zeros((8, 8, 8, 3), np.uint8)
  np.savez_compressed(tmp_path / "cifar10.npz", train=data, test=data)
  cfg, eval_ds, scaler, _, _, score_fn = _harness_setup(
      tmp_path, **{"eval.batch_size": 8})
  nelbo_fn, nll_fn = _identifying_stubs(cfg)
  with caplog.at_level(logging.WARNING):
    results = evaluation.get_bpd(cfg, eval_ds, scaler, nelbo_fn, nll_fn,
                                 score_fn, None, step=0, eval=False)
  eval_ds.close()
  assert "capping" in caplog.text
  assert np.isfinite(results["nelbo"])


def test_bpd_harness_fails_loudly_on_small_real_dataset(tmp_path):
  """A real on-disk dataset smaller than num_test_data must raise, not
  silently report a partial-test-set bpd."""
  from indm_tpu import evaluation

  np.savez_compressed(
      tmp_path / "cifar10.npz",
      train=np.zeros((8, 8, 8, 3), np.uint8),
      test=np.zeros((4, 8, 8, 3), np.uint8))
  cfg, eval_ds, scaler, nelbo_fn, nll_fn, score_fn = _harness_setup(
      tmp_path, **{"eval.num_test_data": 10000})
  with pytest.raises(ValueError, match="refusing"):
    evaluation.get_bpd(cfg, eval_ds, scaler, nelbo_fn, nll_fn, score_fn,
                       None, step=0, eval=True)
  eval_ds.close()
