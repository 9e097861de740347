"""Predictor-Corrector and probability-flow-ODE samplers, TPU-native.

Re-design of `/root/reference/sampling.py:36-621`:
  * predictors/correctors are pure update functions in decorator registries
    (same names: euler_maruyama, reverse_diffusion, ancestral_sampling, none;
    langevin, ald, none);
  * the PC loop is ONE `lax.scan` over the time grid — the whole
    1000-step sampler compiles to a single device program with no host
    round-trips (the reference syncs per step via tqdm + the i==N-2 npz dump,
    `sampling.py:427-445`; we return that intermediate state instead);
  * the ODE sampler integrates on device via `indm_tpu.ode.solve_rk45`.

Samplers take explicit callables:
  score_fn(x, t) -> score           (already closed over params, eval mode)
  flow_inverse(x) -> x'             (or None for flow.model='identity')
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import ode as ode_lib
from indm_tpu import sde as sde_lib
from indm_tpu.sde import right_bcast

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(name):
  def _reg(fn):
    if name in _PREDICTORS:
      raise ValueError(f"Already registered predictor: {name}")
    _PREDICTORS[name] = fn
    return fn
  return _reg


def register_corrector(name):
  def _reg(fn):
    if name in _CORRECTORS:
      raise ValueError(f"Already registered corrector: {name}")
    _CORRECTORS[name] = fn
    return fn
  return _reg


def get_predictor(name):
  return _PREDICTORS[name.lower()]


def get_corrector(name):
  return _CORRECTORS[name.lower()]


# ---------------------------------------------------------------------------
# Predictors (`sampling.py:186-260`). Each returns
# update_fn(rng, x, t, next_t=None) -> (x, x_mean).
# ---------------------------------------------------------------------------


@register_predictor("euler_maruyama")
def euler_maruyama_predictor(sde, score_fn, probability_flow=False):
  rsde = sde.reverse(score_fn, probability_flow)

  def update_fn(rng, x, t, next_t=None):
    dt = -1.0 / rsde.N
    z = jax.random.normal(rng, x.shape)
    drift, diffusion = rsde.sde(x, t)
    x_mean = x + drift * dt
    x = x_mean + right_bcast(diffusion, x) * np.sqrt(-dt) * z
    return x, x_mean

  return update_fn


@register_predictor("reverse_diffusion")
def reverse_diffusion_predictor(sde, score_fn, probability_flow=False):
  rsde = sde.reverse(score_fn, probability_flow)

  def update_fn(rng, x, t, next_t=None):
    f, G = rsde.discretize(x, t, next_t)
    z = jax.random.normal(rng, x.shape)
    x_mean = x - f
    x = x_mean + right_bcast(G, x) * z
    return x, x_mean

  return update_fn


@register_predictor("ancestral_sampling")
def ancestral_sampling_predictor(sde, score_fn, probability_flow=False):
  """`sampling.py:213-249`; VE/VP only."""
  assert not probability_flow, \
      "Probability flow not supported by ancestral sampling"

  if isinstance(sde, sde_lib.VESDE):
    def update_fn(rng, x, t, next_t=None):
      timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
      sigma = sde.discrete_sigmas[timestep]
      adjacent = jnp.where(timestep == 0, jnp.zeros_like(t),
                           sde.discrete_sigmas[jnp.maximum(timestep - 1, 0)])
      score = score_fn(x, t)
      x_mean = x + score * right_bcast(sigma ** 2 - adjacent ** 2, x)
      std = jnp.sqrt(jnp.maximum(
          (adjacent ** 2 * (sigma ** 2 - adjacent ** 2)) / (sigma ** 2), 0.0))
      noise = jax.random.normal(rng, x.shape)
      x = x_mean + right_bcast(std, x) * noise
      return x, x_mean
  elif isinstance(sde, sde_lib.VPSDE):
    def update_fn(rng, x, t, next_t=None):
      timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
      beta = sde.discrete_betas[timestep]
      score = score_fn(x, t)
      x_mean = (x + right_bcast(beta, x) * score) \
          / right_bcast(jnp.sqrt(1.0 - beta), x)
      noise = jax.random.normal(rng, x.shape)
      x = x_mean + right_bcast(jnp.sqrt(beta), x) * noise
      return x, x_mean
  else:
    raise NotImplementedError(
        f"SDE class {sde.__class__.__name__} not yet supported.")
  return update_fn


@register_predictor("none")
def none_predictor(sde, score_fn, probability_flow=False):
  def update_fn(rng, x, t, next_t=None):
    return x, x
  return update_fn


# ---------------------------------------------------------------------------
# Correctors (`sampling.py:263-340`). update_fn(rng, x, t, snr) -> (x, x_mean)
# ---------------------------------------------------------------------------


def _corrector_alpha(sde, t):
  if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    return sde.alphas[timestep]
  return jnp.ones_like(t)


@register_corrector("langevin")
def langevin_corrector(sde, score_fn, snr, n_steps):
  def update_fn(rng, x, t, snr_t=None):
    target_snr = snr if snr_t is None else snr_t
    alpha = _corrector_alpha(sde, t)

    def body(i, carry):
      rng, x, x_mean = carry
      rng, step_rng = jax.random.split(rng)
      grad = score_fn(x, t)
      noise = jax.random.normal(step_rng, x.shape)
      grad_norm = jnp.mean(jnp.linalg.norm(
          grad.reshape(grad.shape[0], -1), axis=-1))
      noise_norm = jnp.mean(jnp.linalg.norm(
          noise.reshape(noise.shape[0], -1), axis=-1))
      step_size = (target_snr * noise_norm / grad_norm) ** 2 * 2 * alpha
      x_mean = x + right_bcast(step_size, x) * grad
      x = x_mean + right_bcast(jnp.sqrt(step_size * 2), x) * noise
      return rng, x, x_mean

    _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
    return x, x_mean

  return update_fn


@register_corrector("ald")
def ald_corrector(sde, score_fn, snr, n_steps):
  """Annealed Langevin dynamics (`sampling.py:295-329`)."""
  def update_fn(rng, x, t, snr_t=None):
    target_snr = snr if snr_t is None else snr_t
    alpha = _corrector_alpha(sde, t)
    std = sde.marginal_prob(x, t)[1]

    def body(i, carry):
      rng, x, x_mean = carry
      rng, step_rng = jax.random.split(rng)
      grad = score_fn(x, t)
      noise = jax.random.normal(step_rng, x.shape)
      step_size = (target_snr * std) ** 2 * 2 * alpha
      x_mean = x + right_bcast(step_size, x) * grad
      x = x_mean + noise * right_bcast(jnp.sqrt(step_size * 2), x)
      return rng, x, x_mean

    _, x, x_mean = jax.lax.fori_loop(0, n_steps, body, (rng, x, x))
    return x, x_mean

  return update_fn


@register_corrector("none")
def none_corrector(sde, score_fn, snr, n_steps):
  def update_fn(rng, x, t, snr_t=None):
    return x, x
  return update_fn


# ---------------------------------------------------------------------------
# PC samplers (`sampling.py:365-545`)
# ---------------------------------------------------------------------------


def get_pc_sampler(config, sde, shape, predictor, corrector, inverse_scaler,
                   snr, n_steps=1, probability_flow=False, continuous=False,
                   denoise=True, eps=1e-3):
  """Build a PC sampler. Returns
  sampler(rng, score_fn, flow_inverse=None, temperature=1., data_mean=None,
          before_data=None, final_time=0.)
  -> (sample_before_flow, sample_after_flow, before_flow_for_search, nfe)

  `before_flow_for_search` is the inverse-scaled state at step N-2 that the
  reference writes to `samples_{r}_before_flow_for_search.npz`
  (`sampling.py:436-445`) — returned instead of written, since the loop is a
  single on-device scan.
  """
  variant = ("search" if config.sampling.pc_denoise
             else "more_step" if config.sampling.more_step else "plain")

  def make_updates(score_fn):
    pred = (none_predictor if predictor is None else predictor)(
        sde, score_fn, probability_flow)
    corr = (none_corrector if corrector is None else corrector)(
        sde, score_fn, snr, n_steps)
    return pred, corr

  def snr_at(i, num_scales):
    if config.sampling.snr_scheduling == "none":
      return config.sampling.snr
    if config.sampling.snr_scheduling == "linear":
      return config.sampling.begin_snr + (
          config.sampling.end_snr - config.sampling.begin_snr
      ) * i / num_scales
    raise ValueError(config.sampling.snr_scheduling)

  def denoise_update(score_fn, rng, x, final_time):
    """Final-time reverse-diffusion denoise (`sampling.py:402-408`)."""
    pred = reverse_diffusion_predictor(sde, score_fn, probability_flow=True)
    vec_eps = jnp.full((x.shape[0],), eps)
    _, x = pred(rng, x, vec_eps, jnp.full_like(vec_eps, final_time))
    return x

  def finish(x, x_mean, score_fn, flow_inverse, temperature):
    sample_before = x_mean if denoise else x
    if flow_inverse is not None:
      sample_after = flow_inverse(sample_before * temperature)
    else:
      sample_after = sample_before
    return inverse_scaler(sample_before), inverse_scaler(sample_after)

  def pc_sampler(rng, score_fn, flow_inverse=None, temperature=1.0,
                 data_mean=None, before_data=None, final_time=0.0):
    pred, corr = make_updates(score_fn)
    num_scales = (config.sampling.num_scales
                  if config.sampling.num_scales != sde.N else sde.N)

    if variant == "plain":
      rng, prior_rng = jax.random.split(rng)
      x = sde.prior_sampling(prior_rng, shape, data_mean)
      timesteps = jnp.linspace(sde.T, eps, num_scales)

      def body(carry, i):
        rng, x, x_mean, x_search = carry
        rng, c_rng, p_rng = jax.random.split(rng, 3)
        t = timesteps[i]
        vec_t = jnp.full((shape[0],), t)
        snr_t = snr_at(i, num_scales)
        x, x_mean = corr(c_rng, x, vec_t, snr_t)
        x, x_mean = pred(p_rng, x, vec_t, None)
        # capture the step-(N-2) mean for the VE denoise search
        x_search = jnp.where(i == num_scales - 2, x_mean, x_search)
        return (rng, x, x_mean, x_search), None

      (rng, x, x_mean, x_search), _ = jax.lax.scan(
          body, (rng, x, x, x), jnp.arange(num_scales))
      before, after = finish(x, x_mean, score_fn, flow_inverse, temperature)
      return before, after, inverse_scaler(x_search), sde.N * (n_steps + 1)

    if variant == "search":
      # `pc_sampler_search` (`sampling.py:458-493`): N-1 steps with explicit
      # next_t, then optional final-time denoise.
      if before_data is None:
        rng, prior_rng = jax.random.split(rng)
        x = sde.prior_sampling(prior_rng, shape, data_mean)
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def body(carry, i):
          rng, x, x_mean = carry
          rng, c_rng, p_rng = jax.random.split(rng, 3)
          vec_t = jnp.full((shape[0],), timesteps[i])
          vec_next = jnp.full((shape[0],), timesteps[i + 1])
          x, x_mean = corr(c_rng, x, vec_t, config.sampling.snr)
          x, x_mean = pred(p_rng, x, vec_t, vec_next)
          return (rng, x, x_mean), None

        (rng, x, x_mean), _ = jax.lax.scan(body, (rng, x, x),
                                           jnp.arange(sde.N - 1))
      else:
        x = x_mean = before_data

      if not config.sampling.need_sample:
        rng, d_rng = jax.random.split(rng)
        x = x_mean = denoise_update(score_fn, d_rng,
                                    x_mean if denoise else x, final_time)
      before, after = finish(x, x_mean, score_fn, flow_inverse, temperature)
      return before, after, None, sde.N * (n_steps + 1)

    # variant == "more_step" (`sampling.py:495-535`): extra 100 log-spaced
    # steps from 1e-3 to 1e-5 after the cached trajectory.
    if before_data is None:
      rng, prior_rng = jax.random.split(rng)
      x = sde.prior_sampling(prior_rng, shape, data_mean)
      timesteps = jnp.linspace(sde.T, eps, sde.N)

      def body(carry, i):
        rng, x, x_mean = carry
        rng, c_rng, p_rng = jax.random.split(rng, 3)
        vec_t = jnp.full((shape[0],), timesteps[i])
        vec_next = jnp.full((shape[0],),
                            timesteps[jnp.minimum(i + 1, sde.N - 1)])
        x, x_mean = corr(c_rng, x, vec_t, None)
        x, x_mean = pred(p_rng, x, vec_t, vec_next)
        return (rng, x, x_mean), None

      (rng, x, x_mean), _ = jax.lax.scan(body, (rng, x, x),
                                         jnp.arange(sde.N))
    else:
      x = x_mean = before_data

    if not config.sampling.need_sample:
      extra = jnp.exp(jnp.linspace(np.log(1e-3), np.log(1e-5), 100))

      def body2(carry, i):
        rng, x, x_mean = carry
        rng, c_rng, p_rng = jax.random.split(rng, 3)
        vec_t = jnp.full((shape[0],), extra[i])
        x, x_mean = corr(c_rng, x, vec_t, config.sampling.snr)
        x, x_mean = pred(p_rng, x, vec_t, None)
        return (rng, x, x_mean), None

      (rng, x, x_mean), _ = jax.lax.scan(body2, (rng, x, x), jnp.arange(100))

    before, after = finish(x, x_mean, score_fn, flow_inverse, temperature)
    return before, after, None, sde.N * (n_steps + 1)

  return pc_sampler


# ---------------------------------------------------------------------------
# ODE sampler (`sampling.py:547-621`)
# ---------------------------------------------------------------------------


def get_ode_sampler(config, sde, shape, inverse_scaler, denoise=False,
                    rtol=1e-5, atol=1e-5, eps=1e-3):
  def ode_sampler(rng, score_fn, flow_inverse=None, temperature=1.0,
                  data_mean=None, before_data=None, final_time=0.0):
    rng, prior_rng, d_rng = jax.random.split(rng, 3)
    x = sde.prior_sampling(prior_rng, shape, data_mean)
    rsde = sde.reverse(score_fn, probability_flow=True)

    def ode_fn(t, y):
      xt = y.reshape(shape)
      vec_t = jnp.full((shape[0],), t)
      drift = rsde.sde(xt, vec_t)[0]
      return drift.reshape(-1)

    y, nfe = ode_lib.solve_rk45(ode_fn, sde.T, eps, x.reshape(-1),
                                rtol=rtol, atol=atol)
    x = y.reshape(shape)

    if denoise:
      pred = reverse_diffusion_predictor(sde, score_fn,
                                         probability_flow=False)
      vec_eps = jnp.full((shape[0],), eps)
      _, x = pred(d_rng, x, vec_eps, jnp.zeros_like(vec_eps))

    sample_before = x
    if flow_inverse is not None:
      sample_after = flow_inverse(sample_before * temperature)
    else:
      sample_after = sample_before
    return (inverse_scaler(sample_before), inverse_scaler(sample_after),
            None, nfe)

  return ode_sampler


def get_sampling_fn(config, sde, shape, inverse_scaler, eps):
  """Dispatch by config (`sampling.py:86-133`)."""
  name = config.sampling.method.lower()
  if name == "ode":
    return get_ode_sampler(config=config, sde=sde, shape=shape,
                           inverse_scaler=inverse_scaler,
                           denoise=config.sampling.noise_removal,
                           rtol=config.eval.rtol, atol=config.eval.atol,
                           eps=eps)
  if name == "pc":
    predictor = get_predictor(config.sampling.predictor.lower())
    corrector = get_corrector(config.sampling.corrector.lower())
    return get_pc_sampler(config=config, sde=sde, shape=shape,
                          predictor=predictor, corrector=corrector,
                          inverse_scaler=inverse_scaler,
                          snr=config.sampling.snr,
                          n_steps=config.sampling.n_steps_each,
                          probability_flow=config.sampling.probability_flow,
                          continuous=config.training.continuous,
                          denoise=config.sampling.noise_removal,
                          eps=eps)
  raise ValueError(f"Sampler name {name} unknown.")
