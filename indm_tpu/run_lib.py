"""Training and evaluation orchestration.

Re-design of `/root/reference/run_lib.py:39-241` and the state plumbing of
`utils.py:61-154`. The hot loop is: host fetches a prefetched numpy batch,
applies uniform dequantization `(255x+u)/256` (`run_lib.py:86`) + scaling,
ships it to the device mesh, and runs ONE jitted step (score-only or joint)
with gradients psum'd across the data axis. Checkpoints are msgpack pytrees
(meta + numbered streams, `run_lib.py:102-114`).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import checkpoint as ckpt_lib
from indm_tpu import data as data_lib
from indm_tpu import joint as joint_lib
from indm_tpu import likelihood as likelihood_lib
from indm_tpu import losses as losses_lib
from indm_tpu import parallel
from indm_tpu import sampling as sampling_lib
from indm_tpu import sde as sde_lib
from indm_tpu import state as state_lib
from indm_tpu.flows.flow_model import create_flow_model, flow_forward
from indm_tpu.models import create_model, get_score_fn


# ---------------------------------------------------------------------------
# Model/checkpoint plumbing (`utils.py:61-145`)
# ---------------------------------------------------------------------------


def create_name(prefix: str, name, ext: str) -> str:
  """Checkpoint file naming helper (`utils.py:50-59`): numbers, bare names,
  and paths all normalize to `{prefix}_{stem}.{ext}`."""
  try:
    return f"{prefix}_{int(name)}.{ext}"
  except (TypeError, ValueError):
    name = str(name)
    if "." not in name:
      return f"{prefix}_{name}.{ext}"
    stem = name.split("/")[-1].split(".")[0]
    return f"{prefix}_{stem}.{ext}"


def load_model(config, workdir, rng):
  """Build the score model state; auto-resume from the meta checkpoint.
  Mirrors `utils.py:61-112` (minus DataParallel)."""
  module, variables = create_model(config, rng)
  optimizer = state_lib.make_optimizer(config)
  params = variables["params"]
  buffers = {k: v for k, v in variables.items() if k != "params"}
  state = state_lib.init_train_state(config, params, buffers, optimizer,
                                     jax.random.fold_in(rng, 1))

  n_params = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(params))
  logging.info("model parameters: %d", n_params)

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  if config.eval.target_ckpt == -1:
    meta = os.path.join(workdir, "checkpoints-meta", "checkpoint.msgpack")
  else:
    meta = os.path.join(checkpoint_dir,
                        f"checkpoint_{config.eval.target_ckpt}.msgpack")
  state = ckpt_lib.restore_checkpoint(config, meta, state)

  if config.optim.reset:
    state = state.replace(opt_state=optimizer.init(state.params))

  # If a flow is configured but has no checkpoint yet, reset the score EMA
  # (`utils.py:103-110`).
  if config.flow.model != "identity":
    flow_meta = os.path.join(workdir, "checkpoints-meta",
                             "flow_checkpoint.msgpack")
    if not os.path.exists(flow_meta):
      logging.info("No flow checkpoints, so reset score ema!!")
      state = state.replace(
          ema_params=jax.tree_util.tree_map(jnp.array, state.params),
          ema_num_updates=jnp.zeros((), jnp.int32))
    else:
      logging.info("There exists flow checkpoints, so keep score ema!!")

  return state, module, optimizer, checkpoint_dir, meta


def load_vdm_aux(config, workdir, rng):
  """VDM extra state (`utils.py:66-74`): gamma_minmax (2-vector, randn init)
  + Noise_Schedule MLP, each with its own optimizer, checkpointed alongside
  the score state (`utils.py:28-32,43-47`).

  Note: as shipped, the reference never wires these into a loss
  (`get_gamma_fn` has no call sites), so they ride through training
  unchanged; we reproduce the state/checkpoint plumbing and expose
  `models.vdm.get_gamma_fn` for experiments that do train them."""
  from indm_tpu.models import vdm as vdm_lib

  if config.model.name != "vdm":
    return None
  r1, r2 = jax.random.split(rng)
  schedule = vdm_lib.NoiseSchedule()
  params = {
      "gamma": jax.random.normal(r1, (2,)),
      "schedule": schedule.init(r2, jnp.zeros((1,)))["params"],
  }
  optimizer = state_lib.make_optimizer(config)
  state = state_lib.init_train_state(config, params, {}, optimizer,
                                     jax.random.fold_in(rng, 3))
  meta = os.path.join(workdir, "checkpoints-meta",
                      "vdm_aux_checkpoint.msgpack")
  state = ckpt_lib.restore_checkpoint(config, meta, state)
  return {"state": state, "module": schedule, "optimizer": optimizer,
          "meta": meta}


def load_flow_model(config, workdir, rng):
  """`utils.py:114-145`."""
  flow_model = create_flow_model(config)
  params, buffers = flow_model.init(rng)
  optimizer = state_lib.make_optimizer(config, lr=config.flow.lr)
  state = state_lib.init_train_state(config, params, buffers, optimizer,
                                     jax.random.fold_in(rng, 2))

  checkpoint_dir = os.path.join(workdir, "checkpoints")
  if config.eval.target_ckpt == -1:
    meta = os.path.join(workdir, "checkpoints-meta",
                        "flow_checkpoint.msgpack")
  else:
    meta = os.path.join(checkpoint_dir,
                        f"flow_checkpoint_{config.eval.target_ckpt}.msgpack")
  state = ckpt_lib.restore_checkpoint(config, meta, state,
                                      keep_optimizer=True)
  if config.flow.optim_reset:
    state = state.replace(opt_state=optimizer.init(state.params))
  return state, flow_model, optimizer, checkpoint_dir, meta


def get_loss_fns(config, sde, inverse_scaler, score_module, flow_model,
                 score_opt, flow_opt, train=True):
  """`utils.py:147-154`: (train_step_fn, nll_fn, nelbo_fn, sampling_fn)."""
  if config.flow.model == "identity":
    train_step_fn = losses_lib.make_score_step_fn(config, sde, score_module,
                                                  score_opt, train=train)
  else:
    train_step_fn = joint_lib.make_joint_step_fn(
        config, sde, score_module, flow_model, score_opt, flow_opt,
        train=train)
  nll_fn = likelihood_lib.get_likelihood_fn(
      config, sde, inverse_scaler, rtol=config.eval.rtol,
      atol=config.eval.atol)
  nelbo_fn = likelihood_lib.get_elbo_fn(config, sde,
                                        inverse_scaler=inverse_scaler)
  sampling_shape = (config.sampling.batch_size, config.data.image_size,
                    config.data.image_size, config.data.num_channels)
  sampling_fn = sampling_lib.get_sampling_fn(
      config, sde, sampling_shape, inverse_scaler,
      config.sampling.truncation_time)
  return train_step_fn, nll_fn, nelbo_fn, sampling_fn


def make_eval_fns(config, sde, score_state, flow_state, score_module,
                  flow_model, use_ema=True):
  """Build eval-mode score_fn / flow_forward closures over (EMA) params."""
  sp = score_state.ema_params if use_ema else score_state.params
  score_fn = get_score_fn(config, sde, score_module,
                          {"params": sp, **score_state.buffers},
                          train=False, continuous=config.training.continuous)
  if flow_model is None:
    return score_fn, None, None

  def ff(x, rng=None):
    z, logdet, _ = flow_forward(config, flow_model, flow_state.params,
                                flow_state.buffers, x, rng=rng, train=False)
    return z, logdet

  def flow_inverse(x, rng=None):
    z, _, _ = flow_forward(config, flow_model, flow_state.params,
                           flow_state.buffers, x, rng=rng, reverse=True,
                           train=False)
    return z

  return score_fn, ff, flow_inverse


# ---------------------------------------------------------------------------
# Train loop (`run_lib.py:39-142`)
# ---------------------------------------------------------------------------


def train(config, workdir, assetdir: Optional[str] = None):
  sample_dir = os.path.join(workdir, "samples")
  os.makedirs(sample_dir, exist_ok=True)

  rng = jax.random.PRNGKey(config.seed)
  score_state, score_module, score_opt, ckpt_dir, meta = load_model(
      config, workdir, jax.random.fold_in(rng, 0))
  initial_step = int(score_state.step)
  logging.info("score model step: %d", initial_step)

  vdm_aux = load_vdm_aux(config, workdir, jax.random.fold_in(rng, 7))

  if config.flow.model == "identity":
    flow_state = flow_model = flow_opt = None
    flow_meta = None
  else:
    flow_state, flow_model, flow_opt, _, flow_meta = load_flow_model(
        config, workdir, jax.random.fold_in(rng, 1))

  logging.info("loading %s...", config.data.dataset)
  train_ds, eval_ds = data_lib.get_dataset(config)
  train_iter = iter(train_ds)
  scaler = data_lib.get_data_scaler(config)
  inverse_scaler = data_lib.get_data_inverse_scaler(config)

  sde = sde_lib.get_sde(config)
  train_step_fn, nll_fn, nelbo_fn, sampling_fn = get_loss_fns(
      config, sde, inverse_scaler, score_module, flow_model, score_opt,
      flow_opt)

  mesh = parallel.get_mesh()
  if config.flow.model == "identity":
    state = parallel.replicate(score_state, mesh)
  else:
    state = parallel.replicate((score_state, flow_state), mesh)
  p_step = parallel.jit_train_step(train_step_fn, mesh,
                                   donate_state=config.jax.donate_state)

  np_rng = np.random.default_rng(config.seed + initial_step)
  logging.info("Starting training loop at step %d.", initial_step)
  t0 = time.time()

  for step in range(initial_step, config.training.n_iters + 1):
    batch, train_iter = data_lib.get_batch(config, train_iter, train_ds)
    # uniform dequantization + scaling (`run_lib.py:86-87`)
    batch = (255.0 * batch + np_rng.random(batch.shape,
                                           dtype=np.float32)) / 256.0
    batch = scaler(batch)
    batch = parallel.shard_batch(batch, mesh)

    # jax.profiler trace of a chosen step window (SURVEY.md §5.1 rebuild)
    prof_dir = config.jax.get("profile_dir", "")
    if prof_dir and step == config.jax.profile_steps[0]:
      jax.profiler.start_trace(prof_dir)

    state, metrics = p_step(state, batch)

    if prof_dir and step == config.jax.profile_steps[1] - 1:
      jax.block_until_ready(metrics)
      jax.profiler.stop_trace()
      logging.info("profiler trace written to %s", prof_dir)

    if step % config.training.log_freq == 0:
      if config.flow.model == "identity":
        losses = np.asarray(metrics)
        logging.info("step: %d, training loss mean: %.5e, std: %.5e "
                     "(%.2f steps/s)", step, losses.mean(), losses.std(),
                     config.training.log_freq / max(time.time() - t0, 1e-9))
      else:
        losses, l_score, l_flow, l_logp = map(np.asarray, metrics)
        logging.info(
            "step: %d, loss mean: %.5e, score: %.5e, flow: %.5e, logp: %.5e "
            "(%.2f steps/s)", step, losses.mean(), l_score.mean(),
            l_flow.mean(), l_logp.mean(),
            config.training.log_freq / max(time.time() - t0, 1e-9))
        # the reference logs a second std line (`run_lib.py:99-100`) — the
        # de-facto regression signal of SURVEY.md §4
        logging.info(
            "step: %d, loss std: %.5e, score: %.5e, flow: %.5e, logp: %.5e",
            step, losses.std(), l_score.std(), l_flow.std(), l_logp.std())
      t0 = time.time()

    is_snapshot = (step != 0 and step != initial_step
                   and step % config.training.snapshot_freq_for_preemption
                   == 0)
    if is_snapshot:
      if config.flow.model == "identity":
        ckpt_lib.save_checkpoint(meta, jax.device_get(state))
      else:
        ss, fs = state
        ckpt_lib.save_checkpoint(meta, jax.device_get(ss))
        ckpt_lib.save_checkpoint(flow_meta, jax.device_get(fs))
      if vdm_aux is not None:  # `utils.py:28-32`
        ckpt_lib.save_checkpoint(vdm_aux["meta"],
                                 jax.device_get(vdm_aux["state"]))

    if (step != 0 and step != initial_step
        and step % config.training.snapshot_freq == 0) \
            or step == config.training.n_iters:
      save_step = step // config.training.snapshot_freq
      if config.flow.model == "identity":
        ckpt_lib.save_checkpoint(
            os.path.join(ckpt_dir, f"checkpoint_{save_step}.msgpack"),
            jax.device_get(state))
      else:
        ss, fs = state
        ckpt_lib.save_checkpoint(
            os.path.join(ckpt_dir, f"checkpoint_{save_step}.msgpack"),
            jax.device_get(ss))
        ckpt_lib.save_checkpoint(
            os.path.join(ckpt_dir, f"flow_checkpoint_{save_step}.msgpack"),
            jax.device_get(fs))

    if is_snapshot and config.eval.enable_bpd:
      _in_training_bpd(config, sde, state, score_module, flow_model,
                       eval_ds, scaler, nelbo_fn, nll_fn, step)

    # reference precedence: (snapshot-cadence AND not step0/initial) OR
    # final step (`run_lib.py:125`)
    if (is_snapshot or step == config.training.n_iters) \
        and config.training.snapshot_sampling:
      _snapshot_sampling(config, sde, state, score_module, flow_model,
                         sampling_fn, inverse_scaler, sample_dir, step,
                         assetdir)

  return state


def _unpack(config, state):
  if config.flow.model == "identity":
    return state, None
  return state


def _in_training_bpd(config, sde, state, score_module, flow_model, eval_ds,
                     scaler, nelbo_fn, nll_fn, step):
  """Full bpd harness at the preemption-snapshot cadence with EMA score
  params (`run_lib.py:116-123` calls `evaluation.get_bpd`; the EMA
  store/copy_to/restore swap is obsoleted by reading ema_params)."""
  from indm_tpu import evaluation
  if config.flow.model == "identity":
    score_state, flow_state = state, None
  else:
    score_state, flow_state = state
  score_fn, ff, _ = make_eval_fns(config, sde, score_state, flow_state,
                                  score_module, flow_model, use_ema=True)
  evaluation.get_bpd(config, eval_ds, scaler, nelbo_fn, nll_fn, score_fn,
                     ff, step=step, eval=False)


def make_jit_sample_round(config, sde, score_module, flow_model,
                          sampling_fn, score_state, flow_state,
                          use_ema: bool = True):
  """One jitted sampling round with the model states as ARGUMENTS.

  Closing the sampler over the weights would bake them into the program as
  constants (~600 MB of inline MLIR for the flagship model) — too large
  for a compile service and recompiled after every state update. Passing
  the states through jit keeps the program small and cacheable."""

  def run(rng, ss, fs, temperature, data_mean, before_data, final_time):
    score_fn, _, flow_inverse = make_eval_fns(
        config, sde, ss, fs, score_module, flow_model, use_ema=use_ema)
    return sampling_fn(rng, score_fn, flow_inverse,
                       temperature=temperature, data_mean=data_mean,
                       before_data=before_data, final_time=final_time)

  jrun = jax.jit(run)

  def sample_round(rng, temperature=1.0, data_mean=None, before_data=None,
                   final_time=0.0):
    # final_time is traced (not baked) so the VE denoise search can sweep
    # `--config.sampling.pc_denoise_time` without recompiling
    # (`sampling_lib.py:60-109`).
    return jrun(rng, score_state, flow_state,
                jnp.asarray(temperature, jnp.float32), data_mean,
                before_data, jnp.asarray(final_time, jnp.float32))

  return sample_round


def _snapshot_sampling(config, sde, state, score_module, flow_model,
                       sampling_fn, inverse_scaler, sample_dir, step,
                       assetdir=None):
  """In-training snapshot evaluation (`run_lib.py:125-142`): ALL
  `num_samples // batch` sampling rounds into `samples/iter_{step}/`, then
  `compute_fid_and_is` over the cached rounds."""
  from indm_tpu import evaluation, sampling_io
  if config.flow.model == "identity":
    score_state, flow_state = state, None
  else:
    score_state, flow_state = state
  _, _, flow_inverse = make_eval_fns(
      config, sde, score_state, flow_state, score_module, flow_model,
      use_ema=True)
  sample_round = make_jit_sample_round(config, sde, score_module, flow_model,
                                       sampling_fn, score_state, flow_state,
                                       use_ema=True)
  this_dir = os.path.join(sample_dir, f"iter_{step}")
  os.makedirs(this_dir, exist_ok=True)
  logging.info("sampling start ...")
  num_rounds = (config.eval.num_samples - 1) // config.sampling.batch_size + 1
  for r in range(num_rounds):
    sampling_io.get_samples(config, flow_inverse, sample_round,
                            step, r, this_dir,
                            rng=jax.random.PRNGKey(step + 1 + r),
                            temperature=config.sampling.temperature)
  logging.info("sampling end ... computing FID ...")
  try:
    evaluation.compute_fid_and_is(config, this_dir, assetdir,
                                  config.eval.num_samples)
  except FileNotFoundError as e:  # no samples cached (shouldn't happen)
    logging.warning("in-training FID skipped: %s", e)


# ---------------------------------------------------------------------------
# Eval loop (`run_lib.py:144-241`)
# ---------------------------------------------------------------------------


def evaluate(config, workdir, assetdir: Optional[str] = None,
             eval_folder: str = "eval"):
  from indm_tpu import evaluation, sampling_io

  eval_dir = os.path.join(workdir, eval_folder)
  os.makedirs(eval_dir, exist_ok=True)

  scaler = data_lib.get_data_scaler(config)
  inverse_scaler = data_lib.get_data_inverse_scaler(config)

  rng = jax.random.PRNGKey(config.seed)
  score_state, score_module, score_opt, ckpt_dir, meta = load_model(
      config, workdir, jax.random.fold_in(rng, 0))
  if config.flow.model == "identity":
    flow_state = flow_model = flow_opt = None
  else:
    flow_state, flow_model, flow_opt, _, _ = load_flow_model(
        config, workdir, jax.random.fold_in(rng, 1))

  sde = sde_lib.get_sde(config)
  _, nll_fn, nelbo_fn, sampling_fn = get_loss_fns(
      config, sde, inverse_scaler, score_module, flow_model, score_opt,
      flow_opt, train=False)

  train_ds, eval_ds = data_lib.get_dataset(config, evaluation=True)

  score_fn, ff, flow_inverse = make_eval_fns(
      config, sde, score_state, flow_state, score_module, flow_model,
      use_ema=config.eval.score_ema)

  if config.eval.enable_bpd:
    evaluation.get_bpd(config, eval_ds, scaler, nelbo_fn, nll_fn, score_fn,
                       ff, step=int(score_state.step), eval=True)

  if config.eval.enable_sampling:
    data_mean = None
    if config.eval.data_mean:
      data_mean = _compute_latent_data_mean(config, sde, train_ds, scaler,
                                            ff)
    step = int(score_state.step)
    logging.info("sampling start ...")
    num_rounds = (config.eval.num_samples - 1) \
        // config.sampling.batch_size + 1
    sample_round = make_jit_sample_round(
        config, sde, score_module, flow_model, sampling_fn, score_state,
        flow_state, use_ema=config.eval.score_ema)
    for r in range(num_rounds):
      idx = (np.random.randint(0, 10000000) if config.sampling.idx_rand
             else r)
      sampling_io.get_samples(
          config, flow_inverse, sample_round, step, idx, eval_dir,
          rng=jax.random.PRNGKey(config.seed + 1000 + r),
          temperature=config.sampling.temperature, data_mean=data_mean)
    logging.info("sampling end ... computing FID ...")
    evaluation.compute_fid_and_is(config, eval_dir, assetdir,
                                  config.eval.num_samples)


def _compute_latent_data_mean(config, sde, train_ds, scaler, ff):
  """Latent mean over the train set for VE prior centering
  (`run_lib.py:192-213`)."""
  total = 0.0
  count = 0
  it = iter(train_ds)
  np_rng = np.random.default_rng(0)
  n_batches = (config.training.num_train_data - 1) \
      // config.training.batch_size + 1
  for i in range(n_batches):
    batch, it = data_lib.get_batch(config, it, train_ds)
    batch = (255.0 * batch + np_rng.random(batch.shape,
                                           dtype=np.float32)) / 256.0
    batch = scaler(jnp.asarray(batch))
    z, _ = ff(batch)
    if config.training.sde != "vesde":
      z, _ = sde.marginal_prob(z, jnp.ones((z.shape[0],)))
    total = total + np.asarray(z).sum(0)
    count += z.shape[0]
  return jnp.asarray(total / config.training.num_train_data)
