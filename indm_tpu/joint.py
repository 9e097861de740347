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


def _split_batch(batch, num_micro: int):
  b = batch.shape[0]
  mb = b // num_micro
  return [batch[i * mb:(i + 1) * mb] for i in range(num_micro)]


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

  # ---------------- NLL variant (`losses.py:258-320`) ----------------------

  def step_nll(states, batch):
    score_state, flow_state = states
    rng, step_rng = jax.random.split(score_state.rng)
    micro = _split_batch(batch, num_micro)
    keys = jax.random.split(step_rng, num_micro)

    g_score = g_flow = None
    auxes = []
    flow_buffers = flow_state.buffers
    for mb, k in zip(micro, keys):
      (_, aux), (gs, gf) = grad_joint(
          score_state.params, flow_state.params, score_state.buffers,
          flow_buffers, mb, k, None, config.training.st)
      flow_buffers = aux["flow_buffers"]
      auxes.append(aux)
      g_score = gs if g_score is None else tree_add(g_score, gs)
      g_flow = gf if g_flow is None else tree_add(g_flow, gf)

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
        jnp.concatenate([a[key] for a in auxes])
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
    micro = _split_batch(batch, num_micro)
    keys = jax.random.split(step_rng, num_micro)
    keys2 = jax.random.split(phase2_rng, num_micro)

    # Phase 1: joint loss, importance sampling ON (`losses.py:359`).
    g_score = g_flow = None
    auxes = []
    flow_buffers = flow_state.buffers
    for mb, k in zip(micro, keys):
      (_, aux), (gs, gf) = grad_joint(
          score_state.params, flow_state.params, score_state.buffers,
          flow_buffers, mb, k, True, False)
      flow_buffers = aux["flow_buffers"]
      auxes.append(aux)
      g_score = gs if g_score is None else tree_add(g_score, gs)
      g_flow = gf if g_flow is None else tree_add(g_flow, gf)

    if train:
      flow_state = apply_update(flow_state, g_flow, flow_opt,
                                config.flow.ema_rate)
      flow_state = flow_state.replace(
          params=update_lipschitz(flow_model, flow_state.params),
          buffers=flow_buffers)

      # Phase 2: score on detached z (`losses.py:379-400`).
      st = config.training.st
      if st:
        # reuse phase-1 latents; rescale the retained phase-1 score grads by
        # const_adj per micro-batch: g <- c_k * g + h_k.
        g2 = g_score
        losses_score_out = []
        for aux, k2 in zip(auxes, keys2):
          z_det = jax.lax.stop_gradient(aux["z"])
          (_, losses_add), h = grad_score_only(
              score_state.params, score_state.buffers, z_det, k2)
          const_adj = jax.lax.stop_gradient(
              jnp.mean(losses_add) / jnp.mean(aux["losses_score"]))
          g2 = tree_add(tree_scale(g2, const_adj), h)
          losses_score_out.append(losses_add)
      else:
        # fresh grads only (`losses.py:379-380` zero_grad), z recomputed with
        # the UPDATED flow under stop_gradient (`losses.py:383-385`; torch
        # no_grad still updates BN running stats — train=True here).
        g2 = None
        losses_score_out = []
        fb = flow_state.buffers
        for mb, k2 in zip(micro, keys2):
          rf, rs = jax.random.split(k2)
          z, _, fb = flow_forward(config, flow_model, flow_state.params, fb,
                                  mb, rng=rf, train=train,
                                  eval_logdet=False)
          z_det = jax.lax.stop_gradient(z)
          (_, losses_add), h = grad_score_only(
              score_state.params, score_state.buffers, z_det, rs)
          g2 = h if g2 is None else tree_add(g2, h)
          losses_score_out.append(losses_add)
        flow_state = flow_state.replace(buffers=fb)

      score_state = apply_update(score_state, g2, score_opt,
                                 config.model.ema_rate)
    else:
      losses_score_out = [a["losses_score"] for a in auxes]

    score_state = score_state.replace(rng=rng)
    losses = jnp.concatenate([a["losses"] for a in auxes])
    losses_flow = jnp.concatenate([a["losses_flow"] for a in auxes])
    losses_logp = jnp.concatenate([a["losses_logp"] for a in auxes])
    losses_score = jnp.concatenate(losses_score_out)
    return (score_state, flow_state), (losses, losses_score, losses_flow,
                                       losses_logp)

  return step_nll if nll_variant else step_fid
