"""Full-model ODE likelihood vs scipy.integrate.solve_ivp.

The on-device RK45 (`indm_tpu/ode.py`) is parity-tested on toy ODEs in
`tests/test_ode.py`; this test pins the GRADED bits/dim metric end-to-end:
the real `likelihood_fn` (tiny NCSN++ score net + wolf flow forward) must
agree with a scipy RK45 driver of the SAME drift/divergence closures and
the SAME random draws, within solver tolerance, with comparable NFE.
Reference semantics: `/root/reference/likelihood.py:94-138` (which uses
scipy directly, crossing the host boundary per function evaluation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate

from indm_tpu import data as data_lib
from indm_tpu import likelihood as likelihood_lib
from indm_tpu import sde as sde_lib
from indm_tpu.configs import get_config
from indm_tpu.flows.flow_model import create_flow_model, flow_forward
from indm_tpu.likelihood import hutchinson_eps
from indm_tpu.models import create_model, get_score_fn
from indm_tpu.sde import right_bcast


@pytest.fixture(scope="module")
def setup():
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.flow.nblocks = "2"
  cfg.flow.intermediate_dim = 16
  cfg.training.batch_size = 4

  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  sde = sde_lib.get_sde(cfg)
  inverse_scaler = data_lib.get_data_inverse_scaler(cfg)
  score_fn = get_score_fn(cfg, sde, module, variables, train=False,
                          continuous=True)
  fm = create_flow_model(cfg)
  f_params, f_buffers = fm.init(jax.random.PRNGKey(1))
  flow_rng = jax.random.PRNGKey(2)

  def flow_forward_fn(x):
    z, logdet, _ = flow_forward(cfg, fm, f_params, f_buffers, x,
                                rng=flow_rng, train=False)
    return z, logdet

  data = jax.random.uniform(jax.random.PRNGKey(3), (4, 8, 8, 3)) * 2 - 1
  return cfg, sde, inverse_scaler, score_fn, flow_forward_fn, data


@pytest.mark.slow
@pytest.mark.parametrize("residual", [False, True])
def test_likelihood_fn_matches_scipy_rk45(setup, residual):
  cfg, sde, inverse_scaler, score_fn, flow_forward_fn, data = setup
  rtol = atol = 1e-5
  eps_bpd = 1e-5
  rng = jax.random.PRNGKey(7)

  likelihood_fn = likelihood_lib.get_likelihood_fn(
      cfg, sde, inverse_scaler, rtol=rtol, atol=atol)
  jit_nll = jax.jit(
      lambda r, b: likelihood_fn(r, score_fn, flow_forward_fn, b,
                                 residual=residual, eps_bpd=eps_bpd))
  bpd_jax, z_jax, nfe_jax = jit_nll(rng, data)
  bpd_jax = np.asarray(bpd_jax)

  # ---- scipy driver of the IDENTICAL computation & random draws
  # (mirrors likelihood_fn line by line) ----
  shape = data.shape
  b = shape[0]
  d = int(np.prod(shape[1:]))
  _, eps_rng, pert_rng, res_rng = jax.random.split(rng, 4)
  epsilon = hutchinson_eps(eps_rng, data, "Rademacher")

  z_data, log_jacob = flow_forward_fn(data)

  if residual:
    z0 = jax.random.normal(pert_rng, z_data.shape)
    mean, std = sde.marginal_prob(z_data, jnp.full((b,), eps_bpd))
    init_x = mean + right_bcast(std, z_data) * z0
  else:
    init_x = z_data
  init = np.concatenate([np.asarray(init_x).reshape(-1), np.zeros((b,))])

  def drift_fn(x, t):
    rsde = sde.reverse(score_fn, probability_flow=True)
    return rsde.sde(x, t)[0]

  div_fn = likelihood_lib.get_div_fn(drift_fn)

  @jax.jit
  def ode_rhs(t, flat):
    x = flat[:-b].reshape(shape)
    vec_t = jnp.full((b,), t)
    drift = drift_fn(x, vec_t)
    logp_grad = div_fn(x, vec_t, epsilon)
    return jnp.concatenate([drift.reshape(-1), logp_grad])

  sol = scipy.integrate.solve_ivp(
      lambda t, y: np.asarray(ode_rhs(t, jnp.asarray(y, jnp.float32))),
      (eps_bpd, float(sde.T)), init, rtol=rtol, atol=atol, method="RK45")
  zp = sol.y[:-b, -1].reshape(shape)
  delta_logp = sol.y[-b:, -1]
  prior_logp = np.asarray(sde.prior_logp(jnp.asarray(zp)))

  if residual:
    residual_fn = likelihood_lib.get_likelihood_residual_fn(
        cfg, sde, score_fn, eps_bpd=eps_bpd)
    delta_logp = delta_logp - np.asarray(residual_fn(res_rng, z_data))

  bpd_scipy = -(prior_logp + delta_logp + np.asarray(log_jacob)) \
      / np.log(2) / d
  bpd_scipy = bpd_scipy + (7.0 - inverse_scaler(-1.0))

  # same drift, same draws, two adaptive controllers: agreement within
  # solver tolerance-induced noise
  np.testing.assert_allclose(bpd_jax, bpd_scipy, rtol=2e-3, atol=2e-3)
  # NFE comparable (within ~40%, as the reference's controller would be)
  assert abs(int(nfe_jax) - sol.nfev) / sol.nfev < 0.4, (int(nfe_jax),
                                                         sol.nfev)
