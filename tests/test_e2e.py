"""End-to-end smoke: tiny train loop through run_lib (synthetic data),
checkpoint save + resume (SURVEY.md §5.3/§5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import checkpoint as ckpt_lib
from indm_tpu import run_lib, state as state_lib
from indm_tpu.configs import get_config


def tiny_cfg(tmp):
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.flow.model = "identity"
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.training.batch_size = 8
  cfg.training.n_iters = 3
  cfg.training.log_freq = 1
  cfg.training.snapshot_freq = 2
  cfg.training.snapshot_freq_for_preemption = 2
  cfg.training.snapshot_sampling = False
  cfg.eval.enable_bpd = False
  cfg.datadir = str(tmp)
  return cfg


def test_train_loop_and_resume(tmp_path):
  cfg = tiny_cfg(tmp_path)
  workdir = str(tmp_path / "work")
  state = run_lib.train(cfg, workdir)
  # reference loop runs steps 0..n_iters inclusive (`run_lib.py:82`), the
  # step counter increments once per call -> final counter = n_iters + 1
  assert int(state.step) == cfg.training.n_iters + 1
  # meta checkpoint written at step 2
  meta = os.path.join(workdir, "checkpoints-meta", "checkpoint.msgpack")
  assert os.path.exists(meta)
  # numbered checkpoint at n_iters
  assert os.path.exists(os.path.join(workdir, "checkpoints",
                                     "checkpoint_1.msgpack"))

  # resume: load_model restores step from the meta checkpoint
  state2, module, opt, _, _ = run_lib.load_model(cfg, workdir,
                                                 jax.random.PRNGKey(0))
  # meta written at loop step 2, after the step fn had incremented to 3
  assert int(state2.step) == 3  # last preemption snapshot


def test_checkpoint_roundtrip(tmp_path):
  cfg = tiny_cfg(tmp_path)
  from indm_tpu.models import create_model
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  opt = state_lib.make_optimizer(cfg)
  st = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"}, opt,
      jax.random.PRNGKey(1))
  st = st.replace(step=jnp.asarray(7, jnp.int32))
  path = str(tmp_path / "ck" / "checkpoint.msgpack")
  ckpt_lib.save_checkpoint(path, st)
  st2 = ckpt_lib.restore_checkpoint(cfg, path, st.replace(
      step=jnp.zeros((), jnp.int32)))
  assert int(st2.step) == 7
  for a, b in zip(jax.tree_util.tree_leaves(st.params),
                  jax.tree_util.tree_leaves(st2.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_missing_returns_fresh(tmp_path):
  cfg = tiny_cfg(tmp_path)
  from indm_tpu.models import create_model
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  opt = state_lib.make_optimizer(cfg)
  st = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"}, opt,
      jax.random.PRNGKey(1))
  out = ckpt_lib.restore_checkpoint(cfg, str(tmp_path / "nope" / "x.msgpack"),
                                    st)
  assert out is st


def test_data_pipeline_synthetic(tmp_path):
  from indm_tpu import data as data_lib
  cfg = tiny_cfg(tmp_path)
  train_ds, eval_ds = data_lib.get_dataset(cfg)
  it = iter(train_ds)
  b, it = data_lib.get_batch(cfg, it, train_ds)
  assert b.shape == (8, 8, 8, 3)
  assert b.dtype == np.float32
  assert 0.0 <= b.min() and b.max() <= 1.0
  train_ds.close()
  eval_ds.close()
