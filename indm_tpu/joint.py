"""Joint flow+score training steps (the INDM core).

Functional re-design of `flow_step_fn_nll` / `flow_step_fn_fid`
(`/root/reference/losses.py:258-420`):

  * NLL variant: one joint loss
        L = L_score(z) + (-log|det|)/D + (-log p_T(z_T))/D,  z = flow(x)
    differentiated w.r.t. BOTH parameter sets in one backward pass
    (`losses.py:289-318`).
  * FID variant: two-phase —
      (1) full joint loss with importance sampling forced ON updates the
          flow; the score gradients from this pass are RETAINED
          (`losses.py:353-376`);
      (2) score loss on detached z (variance weighting); under soft
          truncation the retained phase-1 score grads are rescaled by
          const_adj = mean(L_new)/mean(L_old) before adding
          (`losses.py:379-400`).
  * `update_lipschitz` after each flow step (`losses.py:314,375`) — identity
    for Lop layers, convergence pass for spectral-norm layers.

State: two `TrainState`s (score, flow); the flow state's buffers carry the
wolf encoder's BatchNorm running statistics, updated functionally.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from indm_tpu.ema import ema_update
from indm_tpu.flows.flow_model import FlowModel, flow_forward, update_lipschitz
from indm_tpu.losses import calculate_logp, get_sde_loss_fn
from indm_tpu.models import registry as mutils
from indm_tpu.state import TrainState


def _stack_micro(batch, num_micro: int):
  """[B, ...] -> [num_micro, B/num_micro, ...] contiguous chunks."""
  return batch.reshape((num_micro, -1) + batch.shape[1:])


def make_joint_step_fn(config, sde, score_module, flow_model: FlowModel,
                       score_opt, flow_opt, train: bool = True) -> Callable:
  """Returns step((score_state, flow_state), batch) ->
  ((score_state, flow_state), (losses, losses_score, losses_flow,
  losses_logp)). Dispatch mirrors `losses.py:408-420`."""
  if config.flow.model == "identity":
    raise ValueError("use losses.make_score_step_fn for the identity flow")
  nll_variant = bool(config.training.likelihood_weighting)

  loss_fn = get_sde_loss_fn(config, sde, train)
  d_dim = float(np.prod((config.data.image_size, config.data.image_size,
                         config.data.num_channels)))
  reduce_mean = config.training.reduce_mean
  num_micro = config.optim.num_micro_batch

  def joint_losses(score_params, flow_params, score_buffers, flow_buffers,
                   mb, rng, importance_sampling=None, st=False):
    r_flow, r_score, r_logp = jax.random.split(rng, 3)
    z, logdet_kl, new_fb = flow_forward(
        config, flow_model, flow_params, flow_buffers, mb, rng=r_flow,
        train=train)
    score_fn = mutils.get_score_fn(
        config, sde, score_module, {"params": score_params, **score_buffers},
        train=train, continuous=config.training.continuous)
    losses_score = loss_fn(score_fn, z, r_score, st=st,
                           importance_sampling=importance_sampling)
    losses_logp = calculate_logp(sde, z, r_logp)
    if reduce_mean:
      losses_flow = -logdet_kl / d_dim
      losses_logp = -losses_logp / d_dim
    else:
      losses_flow = -logdet_kl
      losses_logp = -losses_logp
    losses = losses_score + losses_flow + losses_logp
    aux = dict(losses=losses, losses_score=losses_score,
               losses_flow=losses_flow, losses_logp=losses_logp,
               z=z, flow_buffers=new_fb)
    return jnp.mean(losses), aux

  grad_joint = jax.value_and_grad(joint_losses, argnums=(0, 1), has_aux=True)

  def apply_update(state: TrainState, grads, optimizer, ema_rate):
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    n = state.ema_num_updates + 1
    ema_params = ema_update(state.ema_params, params, ema_rate, n)
    return state.replace(step=state.step + 1, params=params,
                         opt_state=opt_state, ema_params=ema_params,
                         ema_num_updates=n)

  def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)

  def tree_scale(a, c):
    return jax.tree_util.tree_map(lambda x: c * x, a)

  _YS_KEYS = ("losses", "losses_score", "losses_flow", "losses_logp", "z")

  def scan_phase1(score_state, flow_state, micro, keys, importance_sampling,
                  st):
    """Accumulate summed phase-1 grads over micro-batches with ONE compiled
    body (`lax.scan`, like `losses.accumulate_microbatch_grads`; replaces the
    reference's host loop at `losses.py:246-251,290-309`). The wolf encoder's
    BatchNorm buffers thread through the scan carry."""

    def body(carry, xs):
      fb, gs, gf = carry
      mb, k = xs
      (_, aux), (gsi, gfi) = grad_joint(
          score_state.params, flow_state.params, score_state.buffers,
          fb, mb, k, importance_sampling, st)
      ys = {key: aux[key] for key in _YS_KEYS}
      return (aux["flow_buffers"], tree_add(gs, gsi),
              tree_add(gf, gfi)), ys

    zeros_s = jax.tree_util.tree_map(jnp.zeros_like, score_state.params)
    zeros_f = jax.tree_util.tree_map(jnp.zeros_like, flow_state.params)
    (fb, g_score, g_flow), ys = jax.lax.scan(
        body, (flow_state.buffers, zeros_s, zeros_f), (micro, keys))
    return ys, g_score, g_flow, fb

  # ---------------- NLL variant (`losses.py:258-320`) ----------------------

  def step_nll(states, batch):
    score_state, flow_state = states
    rng, step_rng = jax.random.split(score_state.rng)
    micro = _stack_micro(batch, num_micro)
    keys = jax.random.split(step_rng, num_micro)

    ys, g_score, g_flow, flow_buffers = scan_phase1(
        score_state, flow_state, micro, keys, None, config.training.st)

    if train:
      score_state = apply_update(score_state, g_score, score_opt,
                                 config.model.ema_rate)
      flow_state = apply_update(flow_state, g_flow, flow_opt,
                                config.flow.ema_rate)
      flow_state = flow_state.replace(
          params=update_lipschitz(flow_model, flow_state.params),
          buffers=flow_buffers)
    score_state = score_state.replace(rng=rng)

    metrics = tuple(
        ys[key].reshape(-1)
        for key in ("losses", "losses_score", "losses_flow", "losses_logp"))
    return (score_state, flow_state), metrics

  # ---------------- FID variant (`losses.py:322-406`) ----------------------

  def score_only_losses(score_params, score_buffers, z_detached, rng):
    score_fn = mutils.get_score_fn(
        config, sde, score_module, {"params": score_params, **score_buffers},
        train=train, continuous=config.training.continuous)
    # phase-2 weighting: config default importance sampling (False for FID
    # configs => variance weighting), no reconstruction term
    # (`losses.py:387`).
    losses = loss_fn(score_fn, z_detached, rng, st=config.training.st,
                     recon_loss=False)
    return jnp.mean(losses), losses

  grad_score_only = jax.value_and_grad(score_only_losses, has_aux=True)

  def step_fid(states, batch):
    score_state, flow_state = states
    rng, step_rng, phase2_rng = jax.random.split(score_state.rng, 3)
    micro = _stack_micro(batch, num_micro)
    keys = jax.random.split(step_rng, num_micro)
    keys2 = jax.random.split(phase2_rng, num_micro)

    # Phase 1: joint loss, importance sampling ON (`losses.py:359`).
    ys, g_score, g_flow, flow_buffers = scan_phase1(
        score_state, flow_state, micro, keys, True, False)

    if train:
      flow_state = apply_update(flow_state, g_flow, flow_opt,
                                config.flow.ema_rate)
      flow_state = flow_state.replace(
          params=update_lipschitz(flow_model, flow_state.params),
          buffers=flow_buffers)

      # Phase 2: score on detached z (`losses.py:379-400`), again one
      # compiled scan body regardless of num_micro_batch.
      st = config.training.st
      if st:
        # reuse phase-1 latents; rescale the retained phase-1 score grads by
        # const_adj per micro-batch: g <- c_k * g + h_k.
        def body_st(g2, xs):
          z, losses_score_p1, k2 = xs
          z_det = jax.lax.stop_gradient(z)
          (_, losses_add), h = grad_score_only(
              score_state.params, score_state.buffers, z_det, k2)
          const_adj = jax.lax.stop_gradient(
              jnp.mean(losses_add) / jnp.mean(losses_score_p1))
          return tree_add(tree_scale(g2, const_adj), h), losses_add

        g2, losses_score_out = jax.lax.scan(
            body_st, g_score, (ys["z"], ys["losses_score"], keys2))
      else:
        # fresh grads only (`losses.py:379-380` zero_grad), z recomputed with
        # the UPDATED flow under stop_gradient (`losses.py:383-385`; torch
        # no_grad still updates BN running stats — train=True here).
        def body_fresh(carry, xs):
          g2, fb = carry
          mb, k2 = xs
          rf, rs = jax.random.split(k2)
          z, _, fb = flow_forward(config, flow_model, flow_state.params, fb,
                                  mb, rng=rf, train=train,
                                  eval_logdet=False)
          z_det = jax.lax.stop_gradient(z)
          (_, losses_add), h = grad_score_only(
              score_state.params, score_state.buffers, z_det, rs)
          return (tree_add(g2, h), fb), losses_add

        zeros_s = jax.tree_util.tree_map(jnp.zeros_like, score_state.params)
        (g2, fb), losses_score_out = jax.lax.scan(
            body_fresh, (zeros_s, flow_state.buffers), (micro, keys2))
        flow_state = flow_state.replace(buffers=fb)

      score_state = apply_update(score_state, g2, score_opt,
                                 config.model.ema_rate)
      losses_score = losses_score_out.reshape(-1)
    else:
      losses_score = ys["losses_score"].reshape(-1)

    score_state = score_state.replace(rng=rng)
    return (score_state, flow_state), (ys["losses"].reshape(-1),
                                       losses_score,
                                       ys["losses_flow"].reshape(-1),
                                       ys["losses_logp"].reshape(-1))

  return step_nll if nll_variant else step_fid
