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

# Multi-minute full-loop tests; the fast subset covers the train/eval loop
# pieces through test_train_step/test_joint/test_checkpoint instead.
pytestmark = pytest.mark.slow


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


def test_in_training_snapshot_runs_full_eval(tmp_path, caplog):
  """At the snapshot step the train loop must run ALL sampling rounds +
  compute_fid_and_is (report npz + FID log line) and the full bpd harness
  (`/root/reference/run_lib.py:116-142`)."""
  import logging

  cfg = tiny_cfg(tmp_path)
  cfg.training.n_iters = 2
  cfg.training.snapshot_freq_for_preemption = 2
  cfg.training.snapshot_sampling = True
  cfg.eval.enable_bpd = True
  cfg.eval.num_nelbo = 1
  cfg.eval.batch_size = 64
  cfg.eval.num_samples = 8
  cfg.eval.skip_nll_wrong = True  # keep the in-training ODE cost down
  cfg.sampling.batch_size = 8
  cfg.sampling.num_scales = 8

  # pre-seeded dataset statistics so FID doesn't feature-extract the whole
  # synthetic train set on CPU
  rng = np.random.default_rng(0)
  a = rng.normal(size=(2048, 32))
  np.savez_compressed(
      tmp_path / "cifar10_fid_stats_clean.npz",
      mu=rng.normal(size=2048), sigma=a @ a.T / 32 + 1e-3 * np.eye(2048))

  workdir = str(tmp_path / "work")
  with caplog.at_level(logging.INFO):
    run_lib.train(cfg, workdir)

  report = os.path.join(workdir, "samples", "iter_2", "report_all.npz")
  assert os.path.exists(report), "in-training FID report missing"
  with np.load(report) as z:
    assert "fid" in z and np.isfinite(float(z["fid"]))
    assert str(z["weights"]) == "random"  # provenance tag
  assert "FID:" in caplog.text
  assert "nelbo bpd" in caplog.text
  assert "NLL CORRECT" in caplog.text


def test_standalone_eval_loop(tmp_path, caplog):
  """`main.py --mode eval` path: `run_lib.evaluate` runs bpd -> sampling
  rounds -> FID end-to-end from a trained workdir
  (`/root/reference/run_lib.py:144-241`). Previously only the in-training
  snapshot eval was covered."""
  import logging

  cfg = tiny_cfg(tmp_path)
  cfg.training.n_iters = 2
  cfg.training.snapshot_freq_for_preemption = 2
  workdir = str(tmp_path / "work")
  run_lib.train(cfg, workdir)

  cfg.eval.enable_bpd = True
  cfg.eval.enable_sampling = True
  cfg.eval.num_nelbo = 1
  cfg.eval.batch_size = 64
  cfg.eval.num_samples = 8
  cfg.eval.skip_nll_wrong = True
  cfg.sampling.batch_size = 8
  cfg.sampling.num_scales = 8
  cfg.sampling.idx_rand = False

  rng = np.random.default_rng(0)
  a = rng.normal(size=(2048, 32))
  np.savez_compressed(
      tmp_path / "cifar10_fid_stats_clean.npz",
      mu=rng.normal(size=2048), sigma=a @ a.T / 32 + 1e-3 * np.eye(2048))

  with caplog.at_level(logging.INFO):
    run_lib.evaluate(cfg, workdir, eval_folder="eval")

  eval_dir = os.path.join(workdir, "eval")
  assert os.path.exists(os.path.join(eval_dir, "report_all.npz"))
  files = os.listdir(eval_dir)
  assert any(f.startswith("samples_") and f.endswith(".npz")
             for f in files), files
  assert "nelbo bpd" in caplog.text
  assert "NLL CORRECT" in caplog.text
  assert "FID:" in caplog.text


def test_eval_target_ckpt_redirects(tmp_path):
  """`eval.target_ckpt` redirects loading from the rolling meta checkpoint
  to a NUMBERED one (`/root/reference/utils.py:89-92`)."""
  cfg = tiny_cfg(tmp_path)
  workdir = str(tmp_path / "work")
  run_lib.train(cfg, workdir)  # writes checkpoint_1 (step 3) + meta (step 3)

  cfg.eval.target_ckpt = 1
  state, _, _, _, meta = run_lib.load_model(cfg, workdir,
                                            jax.random.PRNGKey(0))
  assert meta.endswith("checkpoints/checkpoint_1.msgpack")
  # checkpoint_1 is written at loop step 2 (counter 3) and re-written at
  # the final step n_iters=3 with save_step=3//2=1 (counter 4) — the
  # reference's `or step == num_train_steps` clause
  # (`/root/reference/run_lib.py:109-114`)
  assert int(state.step) == 4

  cfg.eval.target_ckpt = 7  # nonexistent -> fresh state (reference
  # restore_checkpoint returns the passed state when the file is missing)
  state7, _, _, _, _ = run_lib.load_model(cfg, workdir,
                                          jax.random.PRNGKey(0))
  assert int(state7.step) == 0


def test_ve_latent_data_mean(tmp_path):
  """VE eval-time latent data-mean over the train set
  (`/root/reference/run_lib.py:192-213`): flow-forward of every train
  batch, no marginal_prob for VE, mean over num_train_data."""
  cfg = tiny_cfg(tmp_path)
  cfg.training.sde = "vesde"
  cfg.training.num_train_data = 16
  cfg.training.batch_size = 8
  from indm_tpu import data as data_lib
  from indm_tpu import sde as sde_lib
  train_ds, _ = data_lib.get_dataset(cfg, evaluation=True)
  sde = sde_lib.get_sde(cfg)
  scaler = data_lib.get_data_scaler(cfg)
  calls = []

  def ff(batch):
    calls.append(batch.shape)
    return batch * 2.0, None

  dm = run_lib._compute_latent_data_mean(cfg, sde, train_ds, scaler, ff)
  assert dm.shape == (cfg.data.image_size, cfg.data.image_size,
                      cfg.data.num_channels)
  assert len(calls) == 2  # ceil(16 / 8) batches
  assert bool(jnp.all(jnp.isfinite(dm)))


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
