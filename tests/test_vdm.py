"""VDM family: model forward with gamma labels, NoiseSchedule, gamma_fn
normalization, aux-state checkpoint plumbing (SURVEY.md §2.2 VDM row)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu import run_lib
from indm_tpu.configs import get_config
from indm_tpu.models import create_model
from indm_tpu.models import vdm as vdm_lib


def vdm_cfg(tmp):
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.model.name = "vdm"
  cfg.model.scale_by_sigma = False
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.flow.model = "identity"
  cfg.datadir = str(tmp)
  return cfg


def test_vdm_forward(tmp_path):
  cfg = vdm_cfg(tmp_path)
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  x = jnp.zeros((2, 8, 8, 3))
  gamma = jnp.full((2,), 3.0)
  out = module.apply(variables, x, gamma, train=False)
  assert out.shape == x.shape


def test_noise_schedule_and_gamma_fn(tmp_path):
  cfg = vdm_cfg(tmp_path)
  sched = vdm_lib.NoiseSchedule()
  params = sched.init(jax.random.PRNGKey(0), jnp.zeros((1,)))
  g = sched.apply(params, jnp.linspace(0, 1, 5))
  assert g.shape == (5,)
  gamma_minmax = jnp.asarray([-13.3, 5.0])
  gamma_fn = vdm_lib.get_gamma_fn(cfg, gamma_minmax, params, sched)
  # normalized to the [gamma0, gamma1] endpoints (`models/utils.py:127-138`)
  np.testing.assert_allclose(float(gamma_fn(jnp.zeros((1,)))[0]), -13.3,
                             rtol=1e-5)
  np.testing.assert_allclose(float(gamma_fn(jnp.ones((1,)))[0]), 5.0,
                             rtol=1e-5)


def test_vdm_aux_state_checkpoint(tmp_path):
  cfg = vdm_cfg(tmp_path)
  workdir = str(tmp_path / "w")
  os.makedirs(os.path.join(workdir, "checkpoints-meta"), exist_ok=True)
  aux = run_lib.load_vdm_aux(cfg, workdir, jax.random.PRNGKey(0))
  assert aux is not None
  assert aux["state"].params["gamma"].shape == (2,)
  from indm_tpu import checkpoint as ckpt_lib
  ckpt_lib.save_checkpoint(aux["meta"], aux["state"])
  aux2 = run_lib.load_vdm_aux(cfg, workdir, jax.random.PRNGKey(99))
  np.testing.assert_allclose(np.asarray(aux2["state"].params["gamma"]),
                             np.asarray(aux["state"].params["gamma"]))
  # non-vdm models have no aux state
  cfg.model.name = "ncsnpp"
  assert run_lib.load_vdm_aux(cfg, workdir, jax.random.PRNGKey(0)) is None
