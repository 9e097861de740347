"""Score-matching losses and the score-only train step.

Functional re-design of `/root/reference/losses.py:65-256`:
  * losses are pure functions of (params, batch, rng);
  * the per-step host RNG calls (uniform dequant t_min, importance-sampled t,
    gaussian noise) hang off one threaded PRNG key;
  * micro-batch gradient accumulation (`losses.py:246-251`) is a `lax.scan`
    inside the jitted step, summing micro-batch gradients exactly like
    repeated `backward()` calls do;
  * the optimizer (warmup + clip + Adam/AdamW) is an optax chain applied once.

Joint flow+score steps live in `indm_tpu.joint` (built on these pieces).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from indm_tpu import sde as sde_lib
from indm_tpu.ema import ema_update
from indm_tpu.models import registry as mutils
from indm_tpu.state import TrainState


def _reduce_op(config):
  if config.training.reduce_mean:
    return lambda x: jnp.mean(x.reshape(x.shape[0], -1), axis=-1)
  return lambda x: jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def get_sde_loss_fn(config, sde, train: bool, variance: str = "scoreflow"):
  """Continuous DSM loss with three weightings + optional reconstruction
  term (`losses.py:65-144`).

  Returns loss_fn(score_fn, batch, rng, st, recon_loss, importance_sampling)
  -> per-example losses [B]. `score_fn(x, t, rng)` must already close over
  parameters (so the same loss works for score-only and joint training).
  """
  reduce_op = _reduce_op(config)

  def loss_fn(score_fn, batch, rng, st: bool = False,
              recon_loss: Optional[bool] = None,
              importance_sampling: Optional[bool] = None):
    if recon_loss is None:
      recon_loss = config.training.reconstruction_loss
    if importance_sampling is None:
      importance_sampling = config.training.importance_sampling

    rng_tmin, rng_t, rng_z, rng_drop, rng_rz, rng_rd = jax.random.split(rng, 6)
    t_min = sde.get_t_min(rng_tmin, st, config.training.k)
    t, Z = sde.get_diffusion_time(rng_t, batch.shape[0], t_min,
                                  importance_sampling)

    z = jax.random.normal(rng_z, batch.shape)
    mean, std = sde.marginal_prob(batch, t)
    perturbed = mean + sde_lib.right_bcast(std, batch) * z
    score = score_fn(perturbed, t, rng_drop)

    if importance_sampling:
      losses = jnp.square(score * sde_lib.right_bcast(std, batch) + z)
      losses = 0.5 * Z * reduce_op(losses)
    elif config.training.likelihood_weighting:
      g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
      losses = jnp.square(score + z / sde_lib.right_bcast(std, batch))
      losses = 0.5 * Z * reduce_op(losses) * g2
    else:
      losses = jnp.square(score * sde_lib.right_bcast(std, batch) + z)
      losses = 0.5 * Z * reduce_op(losses)

    if recon_loss:
      # One-step denoising reconstruction at t_min (`losses.py:120-140`).
      eps_vec = jnp.full((batch.shape[0],), t_min)
      mean_e, std_e = sde.marginal_prob(batch, eps_vec)
      z_e = jax.random.normal(rng_rz, batch.shape)
      perturbed_e = mean_e + sde_lib.right_bcast(std_e, batch) * z_e
      score_e = score_fn(perturbed_e, eps_vec, rng_rd)

      alpha, beta = sde.marginal_prob(jnp.ones_like(batch), eps_vec)
      q_mean = perturbed_e / alpha + sde_lib.right_bcast(beta, batch) ** 2 \
          * score_e / alpha
      if variance == "ddpm":
        q_std = beta
      elif variance == "scoreflow":
        q_std = beta / jnp.mean(alpha, axis=(1, 2, 3))
      else:
        raise ValueError(variance)

      n_dim = np.prod(batch.shape[1:])
      p_entropy = n_dim / 2.0 * (np.log(2 * np.pi) + 2 * jnp.log(std_e) + 1.0)
      q_recon = n_dim / 2.0 * (np.log(2 * np.pi) + 2 * jnp.log(q_std)) \
          + 0.5 / (q_std ** 2) * jnp.sum(
              jnp.square(batch - q_mean), axis=(1, 2, 3))
      recon = q_recon - p_entropy
      if config.training.reduce_mean:
        recon = recon / n_dim
      losses = losses + recon

    return losses

  return loss_fn


def get_smld_loss_fn(config, vesde, train: bool):
  """Legacy discrete SMLD loss (`losses.py:147-168`).

  Returns loss_fn(model_fn, batch, rng) -> per-example losses.
  """
  assert isinstance(vesde, sde_lib.VESDE), "SMLD training only works for VESDEs."
  smld_sigma_array = jnp.flip(vesde.discrete_sigmas, 0)
  reduce_op = _reduce_op(config)

  def loss_fn(model_fn, batch, rng):
    rng_l, rng_z, rng_d = jax.random.split(rng, 3)
    labels = jax.random.randint(rng_l, (batch.shape[0],), 0, vesde.N)
    sigmas = smld_sigma_array[labels]
    noise = jax.random.normal(rng_z, batch.shape) \
        * sde_lib.right_bcast(sigmas, batch)
    perturbed = noise + batch
    score = model_fn(perturbed, labels, rng_d)
    target = -noise / sde_lib.right_bcast(sigmas ** 2, batch)
    losses = reduce_op(jnp.square(score - target)) * sigmas ** 2
    return losses

  return loss_fn


def get_ddpm_loss_fn(config, vpsde, train: bool):
  """Legacy discrete DDPM loss (`losses.py:171-191`)."""
  assert isinstance(vpsde, sde_lib.VPSDE), "DDPM training only works for VPSDEs."
  reduce_op = _reduce_op(config)

  def loss_fn(model_fn, batch, rng):
    rng_l, rng_z, rng_d = jax.random.split(rng, 3)
    labels = jax.random.randint(rng_l, (batch.shape[0],), 0, vpsde.N)
    noise = jax.random.normal(rng_z, batch.shape)
    perturbed = sde_lib.right_bcast(vpsde.sqrt_alphas_cumprod[labels],
                                    batch) * batch \
        + sde_lib.right_bcast(vpsde.sqrt_1m_alphas_cumprod[labels],
                              batch) * noise
    score = model_fn(perturbed, labels, rng_d)
    losses = reduce_op(jnp.square(score - noise))
    return losses

  return loss_fn


def calculate_logp(sde, batch, rng):
  """Prior log-likelihood of the diffused latent at T (`losses.py:219-225`)."""
  Ts = jnp.full((batch.shape[0],), sde.T)
  meanT, stdT = sde.marginal_prob(batch, Ts)
  z = jax.random.normal(rng, batch.shape)
  yT = meanT + sde_lib.right_bcast(stdT, batch) * z
  return sde.prior_logp(yT)


def accumulate_microbatch_grads(compute_loss_and_grad, batch, rng,
                                num_micro_batch: int):
  """Sum micro-batch gradients (reference accumulation semantics,
  `losses.py:246-251`: grads of per-micro mean losses are *summed*).

  compute_loss_and_grad(micro_batch, rng) -> ((loss_mean, aux), grads)
  where aux is a pytree of per-example vectors. Returns (aux stacked on the
  original batch axis, summed grads).
  """
  if num_micro_batch == 1:
    (_, aux), grads = compute_loss_and_grad(batch, rng)
    return aux, grads

  b = batch.shape[0]
  mb = b // num_micro_batch
  micro = batch[: mb * num_micro_batch].reshape((num_micro_batch, mb)
                                                + batch.shape[1:])
  rngs = jax.random.split(rng, num_micro_batch)

  def body(carry, xs):
    grads_acc = carry
    mb_batch, mb_rng = xs
    (_, aux), grads = compute_loss_and_grad(mb_batch, mb_rng)
    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
    return grads_acc, aux

  (_, aux0), g0 = compute_loss_and_grad(micro[0], rngs[0])
  grads_sum, auxs = jax.lax.scan(body, g0, (micro[1:], rngs[1:]))
  aux = jax.tree_util.tree_map(
      lambda a, rest: jnp.concatenate([a[None], rest]).reshape(
          (mb * num_micro_batch,) + a.shape[1:]),
      aux0, auxs)
  return aux, grads_sum


def make_score_step_fn(config, sde, module, optimizer,
                       train: bool = True) -> Callable:
  """Score-only train step — the `flow.model='identity'` path
  (`losses.py:227-256`). Returns step(state, batch) -> (state, losses[B])."""

  if config.training.continuous:
    sde_loss_fn = get_sde_loss_fn(config, sde, train)
    use_discrete = False
  else:
    assert not config.training.likelihood_weighting, (
        "Likelihood weighting is not supported for original SMLD/DDPM "
        "training.")
    if isinstance(sde, sde_lib.VESDE):
      discrete_loss_fn = get_smld_loss_fn(config, sde, train)
    elif isinstance(sde, sde_lib.VPSDE):
      discrete_loss_fn = get_ddpm_loss_fn(config, sde, train)
    else:
      raise ValueError(
          f"Discrete training for {sde.__class__.__name__} is not "
          "recommended.")
    use_discrete = True

  def step(state: TrainState, batch):
    rng, step_rng = jax.random.split(state.rng)

    def loss_of_params(params, mb, mb_rng):
      variables = {"params": params, **state.buffers}
      if use_discrete:
        model_fn = mutils.get_model_fn(module, variables, train=train)
        losses = discrete_loss_fn(model_fn, mb, mb_rng)
      else:
        score_fn = mutils.get_score_fn(
            config, sde, module, variables, train=train,
            continuous=config.training.continuous)
        losses = sde_loss_fn(score_fn, mb, mb_rng, st=config.training.st)
      return jnp.mean(losses), losses

    def compute(mb, mb_rng):
      return jax.value_and_grad(loss_of_params, has_aux=True)(
          state.params, mb, mb_rng)

    losses, grads = accumulate_microbatch_grads(
        compute, batch, step_rng, config.optim.num_micro_batch)

    if train:
      updates, opt_state = optimizer.update(grads, state.opt_state,
                                            state.params)
      params = optax.apply_updates(state.params, updates)
      n = state.ema_num_updates + 1
      ema_params = ema_update(state.ema_params, params,
                              config.model.ema_rate, n)
      state = state.replace(step=state.step + 1, params=params,
                            opt_state=opt_state, ema_params=ema_params,
                            ema_num_updates=n, rng=rng)
    else:
      state = state.replace(rng=rng)
    return state, losses

  return step
