"""Forward/reverse SDEs for score-based diffusion, TPU-native.

Pure-functional JAX re-design of the reference SDE library
(`/root/reference/sde_lib.py:7-481`): every method is a pure function of
traced arrays (plus static hyperparameters), so the whole train/sample loop
stays inside one `jit`. Host-side RNG calls in the reference
(`np.random.rand` in `get_t_min`, `sde_lib.py:208-215`) become explicit
`jax.random` keys; data-dependent Python branches (`next_t[0].item() > 0`,
`sde_lib.py:110-115`) become elementwise `jnp.where` selects.

Conventions:
  * images are NHWC (TPU-native) but all math only assumes a leading batch
    dimension; per-batch scalars broadcast via `right_bcast`.
  * t has shape [B]; drift has the shape of x; diffusion/std have shape [B].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def right_bcast(v: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
  """Reshape a [B] vector so it broadcasts against x of shape [B, ...]."""
  return v.reshape(v.shape[0], *([1] * (x.ndim - 1)))


def batch_flat_sumsq(z: jnp.ndarray) -> jnp.ndarray:
  return jnp.sum(z.reshape(z.shape[0], -1) ** 2, axis=-1)


class SDE:
  """Abstract SDE (mirrors `sde_lib.py:7-120`)."""

  def __init__(self, N: int):
    self.N = N

  @property
  def T(self) -> float:
    return 1.0

  def sde(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    raise NotImplementedError

  def marginal_prob(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    raise NotImplementedError

  def prior_sampling(self, rng, shape, data_mean=None) -> jnp.ndarray:
    raise NotImplementedError

  def prior_logp(self, z) -> jnp.ndarray:
    raise NotImplementedError

  def discretize(self, x, t, next_t=None):
    """Euler-Maruyama default discretization (`sde_lib.py:55-72`)."""
    dt = 1.0 / self.N
    drift, diffusion = self.sde(x, t)
    f = drift * dt
    G = diffusion * math.sqrt(dt)
    return f, G

  def get_diffusion_time(self, rng, batch_size, t_min, importance_sampling):
    raise NotImplementedError

  def get_t_min(self, rng, st: bool = False, k: float = 1.0):
    """Soft-truncation sampling of t_min (`sde_lib.py:208-215`).

    Returns a traced scalar. With st=False this is just `self.eps`.
    """
    if not st:
      return jnp.asarray(self.eps, jnp.float32)
    u = jax.random.uniform(rng, ())
    eps = self.eps
    if k == 1.0:
      return eps ** (1.0 - u)
    return eps / (1.0 - u * (1.0 - eps ** (k - 1.0))) ** (1.0 / (k - 1.0))

  def reverse(self, score_fn, probability_flow: bool = False):
    """Build the reverse-time SDE/ODE (`sde_lib.py:74-120`)."""
    fwd = self

    class RSDE:
      N = fwd.N
      T = fwd.T

      def __init__(self):
        self.probability_flow = probability_flow

      def sde(self, x, t):
        drift, diffusion = fwd.sde(x, t)
        score = score_fn(x, t)
        coef = 0.5 if probability_flow else 1.0
        drift = drift - right_bcast(diffusion, x) ** 2 * score * coef
        diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift, diffusion

      def discretize(self, x, t, next_t=None):
        # `sde_lib.py:105-118`: when next_t hits 0 exactly, fall back to the
        # continuous diffusion coefficient; elementwise select replaces the
        # host-side `next_t[0].item() > 0` branch.
        if next_t is None:
          f, G = fwd.discretize(x, t, None)
        else:
          f_pos, G_pos = fwd.discretize(x, t, next_t)
          _, diffusion = fwd.sde(x, t)
          G_zero = diffusion * jnp.sqrt(jnp.maximum(t - next_t, 0.0))
          pos = next_t > 0
          f = jnp.where(right_bcast(pos.astype(x.dtype), x) > 0, f_pos,
                        jnp.zeros_like(x))
          G = jnp.where(pos, G_pos, G_zero)
        coef = 0.5 if probability_flow else 1.0
        rev_f = f - right_bcast(G, x) ** 2 * score_fn(x, t) * coef
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G

    return RSDE()


class VPSDE(SDE):
  """Variance-preserving SDE (`sde_lib.py:123-215`)."""

  def __init__(self, truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000):
    super().__init__(N)
    self.beta_0 = float(beta_min)
    self.beta_1 = float(beta_max)
    self.eps = float(truncation_time)
    betas = np.linspace(beta_min / N, beta_max / N, N, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    self.discrete_betas = jnp.asarray(betas, jnp.float32)
    self.alphas = jnp.asarray(alphas, jnp.float32)
    self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
    self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
    self.sqrt_1m_alphas_cumprod = jnp.asarray(
        np.sqrt(1.0 - alphas_cumprod), jnp.float32)

  def _beta_t(self, t):
    return self.beta_0 + t * (self.beta_1 - self.beta_0)

  def sde(self, x, t):
    beta_t = self._beta_t(t)
    drift = -0.5 * right_bcast(beta_t, x) * x
    diffusion = jnp.sqrt(beta_t)
    return drift, diffusion

  def marginal_prob(self, x, t):
    log_mean_coeff = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
        - 0.5 * t * self.beta_0
    mean = jnp.exp(right_bcast(log_mean_coeff, x)) * x
    std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
    return mean, std

  def prior_sampling(self, rng, shape, data_mean=None):
    z = jax.random.normal(rng, shape)
    if data_mean is None:
      return z
    return z + data_mean

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    return -n / 2.0 * np.log(2 * np.pi) - batch_flat_sumsq(z) / 2.0

  def discretize(self, x, t, next_t=None):
    """DDPM discretization (`sde_lib.py:171-184`)."""
    if next_t is None:
      timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
      beta = self.discrete_betas[timestep]
      alpha = self.alphas[timestep]
      f = right_bcast(jnp.sqrt(alpha), x) * x - x
      G = jnp.sqrt(beta)
    else:
      G = jnp.sqrt(jnp.maximum((t - next_t) * self._beta_t(t), 0.0))
      f = right_bcast(jnp.sqrt(1.0 - G ** 2), x) * x - x
    return f, G

  def integral_beta(self, t):
    return 0.5 * t ** 2 * (self.beta_1 - self.beta_0) + t * self.beta_0

  def antiderivative(self, t, stabilizing_constant=0.0):
    t = jnp.asarray(t, jnp.float32)
    ib = self.integral_beta(t)
    return jnp.log(1.0 - jnp.exp(-ib) + stabilizing_constant) + ib

  def normalizing_constant(self, t_min):
    return self.antiderivative(self.T) - self.antiderivative(t_min)

  def get_diffusion_time(self, rng, batch_size, t_min, importance_sampling):
    """Sample t ~ importance distribution or uniform (`sde_lib.py:197-206`)."""
    if importance_sampling:
      Z = self.normalizing_constant(t_min)
      u = jax.random.uniform(rng, (batch_size,))
      t = (-self.beta_0 + jnp.sqrt(
          self.beta_0 ** 2 + 2 * (self.beta_1 - self.beta_0)
          * jnp.log(1.0 + jnp.exp(Z * u + self.antiderivative(t_min)))
      )) / (self.beta_1 - self.beta_0)
      return t, jax.lax.stop_gradient(Z)
    u = jax.random.uniform(rng, (batch_size,))
    return u * (self.T - t_min) + t_min, jnp.asarray(1.0)


class subVPSDE(SDE):
  """sub-VP SDE (`sde_lib.py:217-254`)."""

  def __init__(self, truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000):
    super().__init__(N)
    self.beta_0 = float(beta_min)
    self.beta_1 = float(beta_max)
    self.eps = float(truncation_time)

  def sde(self, x, t):
    beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
    drift = -0.5 * right_bcast(beta_t, x) * x
    discount = 1.0 - jnp.exp(-2 * self.beta_0 * t
                             - (self.beta_1 - self.beta_0) * t ** 2)
    diffusion = jnp.sqrt(beta_t * discount)
    return drift, diffusion

  def marginal_prob(self, x, t):
    log_mean_coeff = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
        - 0.5 * t * self.beta_0
    mean = jnp.exp(right_bcast(log_mean_coeff, x)) * x
    # NOTE: the reference intentionally returns variance-like std here
    # (`sde_lib.py:245`, no sqrt); preserved for parity.
    std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
    return mean, std

  def prior_sampling(self, rng, shape, data_mean=None):
    return jax.random.normal(rng, shape)

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    return -n / 2.0 * np.log(2 * np.pi) - batch_flat_sumsq(z) / 2.0

  def get_diffusion_time(self, rng, batch_size, t_min, importance_sampling):
    u = jax.random.uniform(rng, (batch_size,))
    return u * (self.T - t_min) + t_min, jnp.asarray(1.0)


class VESDE(SDE):
  """Variance-exploding SDE (`sde_lib.py:257-350`)."""

  def __init__(self, truncation_time=1e-5, sigma_min=0.01, sigma_max=50,
               N=1000):
    super().__init__(N)
    self.sigma_min = float(sigma_min)
    self.sigma_max = float(sigma_max)
    self.eps = float(truncation_time)
    self.discrete_sigmas = jnp.exp(jnp.linspace(
        np.log(self.sigma_min), np.log(self.sigma_max), N))

  def _sigma_t(self, t):
    return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

  def sde(self, x, t):
    sigma = self._sigma_t(t)
    drift = jnp.zeros_like(x)
    diffusion = sigma * math.sqrt(
        2 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
    return drift, diffusion

  def marginal_prob(self, x, t):
    std = self._sigma_t(t)
    return x, std

  def prior_sampling(self, rng, shape, data_mean=None):
    z = jax.random.normal(rng, shape) * self.sigma_max
    if data_mean is None:
      return z
    return z + data_mean

  def prior_logp(self, z):
    n = np.prod(z.shape[1:])
    return -n / 2.0 * np.log(2 * np.pi * self.sigma_max ** 2) \
        - batch_flat_sumsq(z) / (2 * self.sigma_max ** 2)

  def discretize(self, x, t, next_t=None):
    """SMLD discretization (`sde_lib.py:310-323`)."""
    if next_t is None:
      timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
      sigma = self.discrete_sigmas[timestep]
      adjacent_sigma = jnp.where(
          timestep == 0, jnp.zeros_like(t),
          self.discrete_sigmas[jnp.maximum(timestep - 1, 0)])
      f = jnp.zeros_like(x)
      G = jnp.sqrt(jnp.maximum(sigma ** 2 - adjacent_sigma ** 2, 0.0))
    else:
      std_t = self._sigma_t(t)
      std_next = self._sigma_t(next_t)
      f = jnp.zeros_like(x)
      G = jnp.sqrt(jnp.maximum(std_t ** 2 - std_next ** 2, 0.0))
    return f, G

  def antiderivative(self, t):
    t = jnp.asarray(t, jnp.float32)
    return 2.0 * jnp.log(self._sigma_t(t))

  def normalizing_constant(self, t_min):
    return self.antiderivative(self.T) - self.antiderivative(t_min)

  def get_diffusion_time(self, rng, batch_size, t_min, importance_sampling):
    """`sde_lib.py:333-341`: the VE importance distribution is uniform in t
    shifted by t_min."""
    if importance_sampling:
      Z = self.normalizing_constant(t_min)
      u = jax.random.uniform(rng, (batch_size,))
      t = t_min + (Z * u) / (2.0 * (math.log(self.sigma_max)
                                    - math.log(self.sigma_min)))
      return t, jax.lax.stop_gradient(Z)
    u = jax.random.uniform(rng, (batch_size,))
    return u * (self.T - t_min) + t_min, jnp.asarray(1.0)


class GeometricVPSDE(VPSDE):
  """Geometric VP SDE (`sde_lib.py:353-466`)."""

  def __init__(self, truncation_time=1e-5, beta_min=0.1, beta_max=20, N=1000,
               sigma2_min=3e-5, sigma2_max=0.999):
    SDE.__init__(self, N)
    self.sigma2_0 = float(sigma2_min)
    self.sigma2_min = float(sigma2_min)
    self.sigma2_max = float(sigma2_max)
    log_term = math.log(self.sigma2_max / self.sigma2_min)
    self.beta_0 = (self.sigma2_min / (1.0 - self.sigma2_min)) * log_term
    self.beta_1 = (self.sigma2_max / (1.0 - self.sigma2_max)) * log_term
    self.eps = float(truncation_time)

    t = np.linspace(0, 1, N)
    sigma2_geom = self.sigma2_min * ((self.sigma2_max / self.sigma2_min) ** t)
    betas = sigma2_geom * log_term / (
        1.0 - self.sigma2_0 + self.sigma2_min - sigma2_geom)
    # The reference builds the same table (`sde_lib.py:369-377`) where the
    # geometric tail pushes beta > 1, so alphas go negative and
    # sqrt(alphas_cumprod) turns NaN for every later index a discrete
    # sampler can touch. Clamp like DDPM's discrete table so all entries
    # stay finite; the clamped tail corresponds to a fully-noised step.
    betas = np.clip(betas, 0.0, 0.999)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    self.discrete_betas = jnp.asarray(betas, jnp.float32)
    self.alphas = jnp.asarray(alphas, jnp.float32)
    self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
    self.sqrt_alphas_cumprod = jnp.asarray(np.sqrt(alphas_cumprod), jnp.float32)
    self.sqrt_1m_alphas_cumprod = jnp.asarray(
        np.sqrt(1.0 - alphas_cumprod), jnp.float32)

  def _geom_beta_t(self, t):
    r = self.sigma2_max / self.sigma2_min
    sigma2_geom = self.sigma2_min * (r ** t)
    log_term = math.log(r)
    return sigma2_geom * log_term / (
        1.0 - self.sigma2_0 + self.sigma2_min - sigma2_geom)

  def sde(self, x, t):
    beta_t = self._geom_beta_t(t)
    drift = -0.5 * right_bcast(beta_t, x) * x
    diffusion = jnp.sqrt(beta_t)
    return drift, diffusion

  def marginal_prob(self, x, t):
    r = self.sigma2_max / self.sigma2_min
    mean = jnp.sqrt(
        1.0 + self.sigma2_min * (1.0 - right_bcast(r ** t, x))
        / (1.0 - self.sigma2_0)) * x
    std = jnp.sqrt(self.sigma2_min * (r ** t) - self.sigma2_min
                   + self.sigma2_0)
    return mean, std

  def discretize(self, x, t, next_t=None):
    if next_t is None:
      raise NotImplementedError(
          "GeometricVPSDE requires an explicit next_t (`sde_lib.py:417-434`).")
    beta_t = self._geom_beta_t(t)
    G = jnp.sqrt(jnp.maximum((t - next_t) * beta_t, 0.0))
    f = right_bcast(jnp.sqrt(1.0 - G ** 2), x) * x - x
    return f, G

  def integral_beta(self, t):
    r = self.sigma2_max / self.sigma2_min
    return jnp.log((1.0 - self.sigma2_min)
                   / (1.0 - self.sigma2_min * (r ** t)))

  def get_diffusion_time(self, rng, batch_size, t_min, importance_sampling):
    # Importance sampling is disabled for GVP in the reference
    # (`sde_lib.py:447-457`).
    u = jax.random.uniform(rng, (batch_size,))
    return u * (self.T - t_min) + t_min, jnp.asarray(1.0)


def get_sde(config) -> SDE:
  """Build the SDE named by the config (`sde_lib.py:469-481`)."""
  name = config.training.sde.lower()
  tt = config.training.truncation_time
  if name == "vpsde":
    return VPSDE(truncation_time=tt, beta_min=config.model.beta_min,
                 beta_max=config.model.beta_max, N=config.model.num_scales)
  if name == "subvpsde":
    return subVPSDE(truncation_time=tt, beta_min=config.model.beta_min,
                    beta_max=config.model.beta_max, N=config.model.num_scales)
  if name == "vesde":
    return VESDE(truncation_time=tt, sigma_min=config.model.sigma_min,
                 sigma_max=config.model.sigma_max, N=config.model.num_scales)
  if name == "gvpsde":
    return GeometricVPSDE(truncation_time=tt, beta_min=config.model.beta_min,
                          beta_max=config.model.beta_max,
                          N=config.model.num_scales)
  raise NotImplementedError(f"SDE {config.training.sde} unknown.")
