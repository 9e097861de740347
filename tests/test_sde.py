"""SDE math unit tests (closed forms + inverse-CDF roundtrips).

Covers SURVEY.md §4(c): marginal_prob/discretize/prior_logp closed forms and
the importance-sampler inverse-CDF roundtrip of `sde_lib.py:197-206,333-341`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import sde as sde_lib


def _vp():
  return sde_lib.VPSDE(truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000)


def _ve():
  return sde_lib.VESDE(truncation_time=1e-5, sigma_min=0.01, sigma_max=50,
                       N=1000)


def test_vp_marginal_prob_closed_form():
  sde = _vp()
  x = jnp.ones((4, 2, 2, 3))
  t = jnp.asarray([0.0, 0.25, 0.5, 1.0])
  mean, std = sde.marginal_prob(x, t)
  lmc = -0.25 * t**2 * (20 - 0.1) - 0.5 * t * 0.1
  np.testing.assert_allclose(mean[:, 0, 0, 0], np.exp(lmc), rtol=1e-6)
  np.testing.assert_allclose(std, np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-5)
  # Variance preservation: mean^2 + std^2 == 1 for unit data.
  np.testing.assert_allclose(mean[:, 0, 0, 0]**2 + std**2, 1.0, rtol=1e-5)


def test_vp_prior_logp_is_standard_normal():
  sde = _vp()
  z = jnp.zeros((2, 4, 4, 3))
  lp = sde.prior_logp(z)
  n = 4 * 4 * 3
  np.testing.assert_allclose(lp, -n / 2 * np.log(2 * np.pi), rtol=1e-6)


def test_ve_marginal_and_prior():
  sde = _ve()
  x = jnp.ones((3, 2, 2, 1))
  t = jnp.asarray([0.0, 0.5, 1.0])
  mean, std = sde.marginal_prob(x, t)
  np.testing.assert_allclose(mean, x)
  np.testing.assert_allclose(std, 0.01 * (50 / 0.01) ** np.asarray(t),
                             rtol=1e-5)
  z = jnp.zeros((2, 2, 2, 1))
  lp = sde.prior_logp(z)
  np.testing.assert_allclose(lp, -4 / 2 * np.log(2 * np.pi * 50**2), rtol=1e-6)


def test_vp_importance_sampling_inverse_cdf_roundtrip():
  """t = F^{-1}(u) must satisfy antiderivative(t) == Z*u + antiderivative(eps)."""
  sde = _vp()
  rng = jax.random.PRNGKey(0)
  t_min = 1e-5
  t, Z = sde.get_diffusion_time(rng, 512, t_min, importance_sampling=True)
  u_rec = (sde.antiderivative(t) - sde.antiderivative(t_min)) / Z
  assert float(t.min()) >= t_min - 1e-8
  assert float(t.max()) <= sde.T + 1e-6
  u = jax.random.uniform(rng, (512,))
  # f32 cancellation in log(1-exp(-beta_int)) near t_min limits precision.
  np.testing.assert_allclose(np.asarray(u_rec), np.asarray(u), atol=5e-3)


def test_ve_importance_sampling_range():
  sde = _ve()
  rng = jax.random.PRNGKey(1)
  t, Z = sde.get_diffusion_time(rng, 256, 1e-5, importance_sampling=True)
  # VE importance sampling is uniform over [t_min, t_min + 1] since
  # Z = 2 log(smax/smin) cancels (`sde_lib.py:333-341`).
  assert float(t.min()) >= 1e-5 - 1e-8
  assert float(t.max()) <= 1.0 + 1e-4


def test_soft_truncation_t_min_distribution():
  sde = _vp()
  keys = jax.random.split(jax.random.PRNGKey(2), 512)
  vals = jax.vmap(lambda k: sde.get_t_min(k, st=True, k=1.0))(keys)
  vals = np.asarray(vals)
  assert vals.min() >= sde.eps - 1e-12 and vals.max() <= 1.0
  # log(t_min) ~ Uniform[log(eps), 0]
  logs = np.log(vals) / np.log(sde.eps)
  assert 0.4 < logs.mean() < 0.6


def test_reverse_sde_ode_drift_relation():
  """ODE drift = SDE drift - 1/2 g^2 score; reverse SDE uses full g^2 score."""
  sde = _vp()
  x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
  t = jnp.full((2,), 0.5)
  score_fn = lambda x, t: -x  # linear score
  f_fwd, g = sde.sde(x, t)
  r_sde = sde.reverse(score_fn, probability_flow=False)
  r_ode = sde.reverse(score_fn, probability_flow=True)
  d_sde, g_sde = r_sde.sde(x, t)
  d_ode, g_ode = r_ode.sde(x, t)
  g2 = sde_lib.right_bcast(g, x) ** 2
  np.testing.assert_allclose(np.asarray(d_sde), np.asarray(f_fwd + g2 * x),
                             rtol=1e-5)
  np.testing.assert_allclose(np.asarray(d_ode), np.asarray(f_fwd + 0.5 * g2 * x),
                             rtol=1e-5)
  assert float(jnp.max(jnp.abs(g_ode))) == 0.0
  np.testing.assert_allclose(np.asarray(g_sde), np.asarray(g))


def test_reverse_discretize_next_t_zero_branch():
  """`sde_lib.py:110-115`: next_t == 0 switches to continuous-g discretization."""
  sde = _vp()
  x = jnp.ones((2, 2, 2, 1))
  t = jnp.full((2,), 1e-3)
  score_fn = lambda x, t: jnp.zeros_like(x)
  rsde = sde.reverse(score_fn, probability_flow=True)
  f, G = rsde.discretize(x, t, next_t=jnp.zeros((2,)))
  # zero-branch: f = 0 - 0.5*G^2*score = 0; G (pf) = 0
  np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)
  np.testing.assert_allclose(np.asarray(G), 0.0, atol=1e-7)
  # positive branch keeps VP form
  f2, _ = rsde.discretize(x, t, next_t=jnp.full((2,), 5e-4))
  beta_t = 0.1 + 1e-3 * (20 - 0.1)
  G_expect = np.sqrt(5e-4 * beta_t)
  np.testing.assert_allclose(np.asarray(f2[:, 0, 0, 0]),
                             np.sqrt(1 - G_expect**2) - 1, atol=1e-7)


def test_gvp_marginal_matches_tables():
  sde = sde_lib.GeometricVPSDE(N=1000)
  x = jnp.ones((1, 2, 2, 1))
  t = jnp.asarray([1.0])
  _, std = sde.marginal_prob(x, t)
  np.testing.assert_allclose(float(std[0]), np.sqrt(sde.sigma2_max), rtol=1e-5)


def test_gvp_discrete_tables_all_finite():
  """Every discrete-table entry a sampler can index must be finite: the
  reference's table (`sde_lib.py:369-377`) carries NaN sqrt(alphas_cumprod)
  in the geometric tail (betas > 1); the rebuild clamps instead."""
  sde = sde_lib.GeometricVPSDE(N=1000)
  for name in ("discrete_betas", "alphas", "alphas_cumprod",
               "sqrt_alphas_cumprod", "sqrt_1m_alphas_cumprod"):
    table = np.asarray(getattr(sde, name))
    assert table.shape == (1000,)
    assert np.isfinite(table).all(), name
  assert (np.asarray(sde.discrete_betas) < 1.0).all()
  # tail underflows to exactly 0 (fully noised) — never negative
  assert (np.asarray(sde.alphas_cumprod) >= 0.0).all()
  assert (np.asarray(sde.sqrt_1m_alphas_cumprod) <= 1.0).all()


def test_get_sde_dispatch():
  from indm_tpu.configs import get_config
  cfg = get_config("vp/CIFAR10/indm_nll")
  assert isinstance(sde_lib.get_sde(cfg), sde_lib.VPSDE)
  cfg = get_config("ve/CIFAR10/indm")
  assert isinstance(sde_lib.get_sde(cfg), sde_lib.VESDE)
