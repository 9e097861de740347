"""Likelihood (bits/dim): probability-flow-ODE NLL, NELBO, residual
correction — all on-device.

Re-design of `/root/reference/likelihood.py:27-283`. The reference's NLL
crosses numpy<->torch per RK45 function evaluation (`likelihood.py:94-116`);
here the whole solve runs inside one jit via `indm_tpu.ode.solve_rk45`.
Hutchinson divergences use `jax.vjp` instead of `torch.autograd.grad`.

All entry points take explicit closures:
  score_fn(x, t) -> score                        (eval mode, params closed)
  flow_forward_fn(x) -> (z, log_jacob) or None   (None == identity flow)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import ode as ode_lib
from indm_tpu.sde import right_bcast


def rademacher_like(rng, x):
  return jax.random.randint(rng, x.shape, 0, 2).astype(x.dtype) * 2 - 1.0


def hutchinson_eps(rng, x, hutchinson_type: str):
  if hutchinson_type == "Gaussian":
    return jax.random.normal(rng, x.shape)
  if hutchinson_type == "Rademacher":
    return rademacher_like(rng, x)
  raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")


def get_div_fn(fn):
  """Hutchinson-Skilling divergence of fn(x, t) via one VJP
  (`likelihood.py:27-38`)."""

  def div_fn(x, t, eps):
    _, vjp = jax.vjp(lambda xx: fn(xx, t), x)
    (grad_fn_eps,) = vjp(eps)
    return jnp.sum((grad_fn_eps * eps).reshape(x.shape[0], -1), axis=-1)

  return div_fn


def get_likelihood_residual_fn(config, sde, score_fn,
                               variance: str = "scoreflow",
                               eps_bpd: float = 1e-5):
  """Truncation-gap correction (`likelihood.py:241-283`).

  Returns residual_fn(rng, batch) -> residual [B].
  """

  def residual_fn(rng, batch):
    rng1, rng2 = jax.random.split(rng)
    tt = config.training.truncation_time
    eps_vec = jnp.full((batch.shape[0],), tt)
    mean, std = sde.marginal_prob(batch, eps_vec)
    z = jax.random.normal(rng1, batch.shape)
    perturbed = mean + right_bcast(std, batch) * z
    score = score_fn(perturbed, eps_vec)
    noise = -right_bcast(std, batch) * score

    eps_vec2 = jnp.full((batch.shape[0],), eps_bpd)
    mean2, std2 = sde.marginal_prob(batch, eps_vec2)
    z2 = jax.random.normal(rng2, batch.shape)
    perturbed2 = mean2 + right_bcast(std2, batch) * z2

    alpha, beta = sde.marginal_prob(jnp.ones_like(batch), eps_vec2)
    q_mean = perturbed2 / alpha - right_bcast(beta, batch) * noise / alpha
    if variance == "ddpm":
      q_std = beta
    elif variance == "scoreflow":
      q_std = beta / jnp.mean(alpha, axis=(1, 2, 3))
    else:
      raise ValueError(variance)

    n_dim = np.prod(batch.shape[1:])
    p_entropy = n_dim / 2.0 * (np.log(2 * np.pi) + 2 * jnp.log(std2) + 1.0)
    q_recon = n_dim / 2.0 * (np.log(2 * np.pi) + 2 * jnp.log(q_std)) \
        + 0.5 / (q_std ** 2) * jnp.sum(jnp.square(batch - q_mean),
                                       axis=(1, 2, 3))
    return q_recon - p_entropy

  return residual_fn


def get_likelihood_fn(config, sde, inverse_scaler,
                      hutchinson_type: str = "Rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5):
  """ODE log-likelihood in bits/dim (`likelihood.py:41-140`).

  Returns likelihood_fn(rng, score_fn, flow_forward_fn, data, logdet=None,
                        residual=True, eps_bpd=1e-5) -> (bpd [B], z, nfe).
  """

  def drift_fn(score_fn, x, t):
    rsde = sde.reverse(score_fn, probability_flow=True)
    return rsde.sde(x, t)[0]

  def likelihood_fn(rng, score_fn, flow_forward_fn, data, logdet=None,
                    residual: bool = True, eps_bpd: float = 1e-5):
    shape = data.shape
    b = shape[0]
    d = int(np.prod(shape[1:]))
    rng, eps_rng, pert_rng, res_rng = jax.random.split(rng, 4)
    epsilon = hutchinson_eps(eps_rng, data, hutchinson_type)

    if flow_forward_fn is not None:
      data, log_jacob = flow_forward_fn(data)
    else:
      log_jacob = jnp.zeros((b,), data.dtype)

    if residual:
      z0 = jax.random.normal(pert_rng, data.shape)
      mean, std = sde.marginal_prob(
          data, jnp.full((b,), eps_bpd, data.dtype))
      init_x = mean + right_bcast(std, data) * z0
    else:
      init_x = data
    init = jnp.concatenate([init_x.reshape(-1), jnp.zeros((b,), data.dtype)])

    div_fn = get_div_fn(lambda xx, tt: drift_fn(score_fn, xx, tt))

    def ode_fn(t, y):
      x = y[:-b].reshape(shape)
      vec_t = jnp.full((b,), t)
      drift = drift_fn(score_fn, x, vec_t)
      logp_grad = div_fn(x, vec_t, epsilon)
      return jnp.concatenate([drift.reshape(-1), logp_grad])

    y, nfe = ode_lib.solve_rk45(ode_fn, eps_bpd, sde.T, init,
                                rtol=rtol, atol=atol)
    z = y[:-b].reshape(shape)
    delta_logp = y[-b:]
    prior_logp = sde.prior_logp(z)

    if residual:
      residual_fn = get_likelihood_residual_fn(config, sde, score_fn,
                                               eps_bpd=eps_bpd)
      delta_logp = delta_logp - residual_fn(res_rng, data)
    if logdet is None:
      logdet = jnp.zeros((b,), data.dtype)

    bpd = -(prior_logp + delta_logp + logdet + log_jacob) / np.log(2) / d
    offset = 7.0 - inverse_scaler(-1.0)
    return bpd + offset, z, nfe

  return likelihood_fn


def get_elbo_fn(config, sde, inverse_scaler=None,
                hutchinson_type: str = "Rademacher"):
  """Single-sample interior NELBO estimator (`likelihood.py:142-238`).

  Returns elbo_fn(rng, score_fn, flow_forward_fn, batch, logdet=None)
  -> (nelbo_bpd [B], nelbo_residual_bpd [B]).
  """

  def elbo_fn(rng, score_fn, flow_forward_fn, batch, logdet=None):
    b = batch.shape[0]
    if flow_forward_fn is not None:
      batch, log_jacob = flow_forward_fn(batch)
    else:
      log_jacob = jnp.zeros((b,), batch.dtype)
    if logdet is None:
      logdet = jnp.zeros((b,), batch.dtype)

    # GVP quirk: interior t sampled from [1e-6, T] (`likelihood.py:184-188`).
    t_min = 1e-6 if config.training.sde == "gvpsde" else sde.eps

    rng, t_rng, z_rng, h_rng, lp_rng, res_rng = jax.random.split(rng, 6)
    t, Z = sde.get_diffusion_time(t_rng, b, t_min, importance_sampling=True)
    qt = 1.0 / sde.T
    z = jax.random.normal(z_rng, batch.shape)
    mean, std = sde.marginal_prob(batch, t)
    perturbed = mean + right_bcast(std, batch) * z

    def mu_of(x):
      score = score_fn(x, t)
      f, g = sde.sde(x, t)
      s2 = right_bcast(std, batch) ** 2
      return s2 * score - s2 / right_bcast(g, batch) ** 2 * f

    epsilon = hutchinson_eps(h_rng, batch, hutchinson_type)
    mu, vjp = jax.vjp(mu_of, perturbed)
    (grad_mu_eps,) = vjp(epsilon)
    Mu = -jnp.sum((grad_mu_eps * epsilon).reshape(b, -1), axis=-1) * Z / qt

    score = score_fn(perturbed, t)
    a = right_bcast(std, batch) * score
    Nu = -jnp.sum((a ** 2).reshape(b, -1), axis=-1) * Z / 2.0 / qt

    lp_t = jnp.full((b,), sde.T)
    lp_z = jax.random.normal(lp_rng, batch.shape)
    lp_mean, lp_std = sde.marginal_prob(batch, lp_t)
    lp = sde.prior_logp(lp_mean + right_bcast(lp_std, batch) * lp_z)

    elbos = lp + Mu + Nu + log_jacob

    residual_fn = get_likelihood_residual_fn(
        config, sde, score_fn, eps_bpd=config.training.truncation_time)
    residual_nll = residual_fn(res_rng, batch)
    elbos_residual = elbos - residual_nll

    d = np.prod(batch.shape[1:])
    offset = 7.0 - inverse_scaler(-1.0)
    nelbo = -(elbos + logdet) / d / np.log(2) + offset
    nelbo_res = -(elbos_residual + logdet) / d / np.log(2) + offset
    return nelbo, nelbo_res

  return elbo_fn
