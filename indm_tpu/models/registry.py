"""Model registry + score-function wrappers (JAX).

Port of `/root/reference/models/utils.py:24-197`. The reference wraps models
in `torch.nn.DataParallel` at creation (`models/utils.py:88-94`); here data
parallelism lives in the train step (`indm_tpu.parallel`), so `create_model`
just initializes a flax module + variables pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import sde as sde_lib

_MODELS = {}


def register_model(cls=None, *, name: Optional[str] = None):
  """Decorator registry (`models/utils.py:27-43`)."""

  def _register(cls):
    local_name = cls.__name__ if name is None else name
    if local_name in _MODELS:
      raise ValueError(f"Already registered model with name: {local_name}")
    _MODELS[local_name] = cls
    return cls

  if cls is None:
    return _register
  return _register(cls)


def get_model(name: str):
  return _MODELS[name]


def get_sigmas(config) -> np.ndarray:
  """Descending SMLD noise levels (`models/utils.py:50-60`)."""
  return np.exp(np.linspace(np.log(config.model.sigma_max),
                            np.log(config.model.sigma_min),
                            config.model.num_scales)).astype(np.float32)


def get_ddpm_params(config):
  """DDPM beta tables (`models/utils.py:63-85`)."""
  num_diffusion_timesteps = 1000
  beta_start = config.model.beta_min / config.model.num_scales
  beta_end = config.model.beta_max / config.model.num_scales
  betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                      dtype=np.float64)
  alphas = 1.0 - betas
  alphas_cumprod = np.cumprod(alphas, axis=0)
  return {
      "betas": betas,
      "alphas": alphas,
      "alphas_cumprod": alphas_cumprod,
      "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
      "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
      "beta_min": beta_start * (num_diffusion_timesteps - 1),
      "beta_max": beta_end * (num_diffusion_timesteps - 1),
      "num_diffusion_timesteps": num_diffusion_timesteps,
  }


def create_model(config, rng):
  """Build the score model module + initial variables
  (replaces `models/utils.py:88-94`; no DataParallel — sharding is applied
  to the jitted step instead).

  Returns (module, variables) where `variables` holds 'params' plus any
  'buffers' collections (e.g. the fixed Fourier projection).
  """
  model_name = config.model.name
  module = get_model(model_name)(config)
  b = 2
  x = jnp.zeros((b, config.data.image_size, config.data.image_size,
                 config.data.num_channels), jnp.float32)
  t = jnp.ones((b,), jnp.float32)
  p_rng, d_rng = jax.random.split(rng)
  variables = module.init({"params": p_rng, "dropout": d_rng}, x, t,
                          train=False)
  return module, variables


def get_model_fn(module, variables, train: bool = False) -> Callable:
  """`models/utils.py:96-125`. Returned fn takes (x, labels, rng)."""

  def model_fn(x, labels, rng=None):
    rngs = {"dropout": rng} if (train and rng is not None) else None
    return module.apply(variables, x, labels, train=train, rngs=rngs)

  return model_fn


def get_score_fn(config, sde, module, variables, gamma_t=None,
                 train: bool = False, continuous: bool = False) -> Callable:
  """Map network output -> score (`models/utils.py:140-197`).

  Returned score_fn(x, t, rng=None).
  """
  model_fn = get_model_fn(module, variables, train=train)

  if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):

    def score_fn(x, t, rng=None):
      if continuous or isinstance(sde, sde_lib.subVPSDE):
        if config.training.unbounded_parametrization:
          c = config.training.stabilizing_constant
          labels = (sde.antiderivative(t, c) - sde.antiderivative(1e-5, c)) / (
              sde.antiderivative(sde.T, c) - sde.antiderivative(1e-5, c)
          ) * 999.0
        elif config.model.name == "vdm":
          labels = gamma_t
        else:
          labels = t * 999
        score = model_fn(x, labels, rng)
        std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
      else:
        labels = t * (sde.N - 1)
        score = model_fn(x, labels, rng)
        std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]

      if config.training.ddpm_score:
        score = -score / sde_lib.right_bcast(std, x)
      return score

  elif isinstance(sde, sde_lib.VESDE):

    def score_fn(x, t, rng=None):
      if continuous:
        labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
      else:
        labels = sde.T - t
        labels = jnp.round(labels * (sde.N - 1)).astype(jnp.int32)
      return model_fn(x, labels, rng)

  else:
    raise NotImplementedError(
        f"SDE class {sde.__class__.__name__} not yet supported.")

  return score_fn
