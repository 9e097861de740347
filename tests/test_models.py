"""NCSN++ construction/forward tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import sde as sde_lib
from indm_tpu.configs import get_config
from indm_tpu.models import create_model, get_score_fn


def tiny(config, img=16, nf=16, blocks=1):
  config.data.image_size = img
  config.model.nf = nf
  config.model.num_res_blocks = blocks
  config.model.ch_mult = (1, 2)
  config.model.attn_resolutions = (img // 2,)
  config.training.batch_size = 2
  return config


@pytest.fixture(scope="module")
def vp_cfg():
  return tiny(get_config("vp/CIFAR10/indm_nll"))


@pytest.fixture(scope="module")
def ve_cfg():
  return tiny(get_config("ve/CIFAR10/indm"))


def test_ncsnpp_vp_forward_shape(vp_cfg):
  rng = jax.random.PRNGKey(0)
  module, variables = create_model(vp_cfg, rng)
  x = jax.random.normal(rng, (2, 16, 16, 3))
  t = jnp.asarray([0.1, 0.9]) * 999
  out = module.apply(variables, x, t, train=False)
  assert out.shape == x.shape
  assert np.isfinite(np.asarray(out)).all()


def test_ncsnpp_ve_forward_shape_fir(ve_cfg):
  """VE path: fourier embedding + FIR resampling + progressive_input=residual
  + scale_by_sigma (`configs/ve/CIFAR10/indm.py:38-61`)."""
  rng = jax.random.PRNGKey(0)
  module, variables = create_model(ve_cfg, rng)
  x = jax.random.normal(rng, (2, 16, 16, 3))
  sigmas = jnp.asarray([1.0, 10.0])  # VE labels are marginal stds
  out = module.apply(variables, x, sigmas, train=False)
  assert out.shape == x.shape
  assert np.isfinite(np.asarray(out)).all()


def test_score_fn_vp_scaling(vp_cfg):
  """VP continuous: score = -net_out/std with ddpm_score=True
  (`models/utils.py:154-179`)."""
  rng = jax.random.PRNGKey(1)
  module, variables = create_model(vp_cfg, rng)
  sde = sde_lib.get_sde(vp_cfg)
  score_fn = get_score_fn(vp_cfg, sde, module, variables, train=False,
                          continuous=True)
  x = jax.random.normal(rng, (2, 16, 16, 3))
  t = jnp.asarray([0.3, 0.7])
  score = score_fn(x, t)
  raw = module.apply(variables, x, t * 999, train=False)
  std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
  np.testing.assert_allclose(
      np.asarray(score), np.asarray(-raw / std[:, None, None, None]),
      rtol=1e-5)


def test_dropout_rng_changes_train_output():
  # init_scale=0 (default) zeroes the post-dropout convs at init, hiding
  # dropout noise; use init_scale=1 to expose it.
  cfg = tiny(get_config("vp/CIFAR10/indm_nll"))
  cfg.model.init_scale = 1.0
  rng = jax.random.PRNGKey(2)
  module, variables = create_model(cfg, rng)
  x = jax.random.normal(rng, (2, 16, 16, 3))
  t = jnp.asarray([100.0, 500.0])
  o1 = module.apply(variables, x, t, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
  o2 = module.apply(variables, x, t, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
  assert not np.allclose(np.asarray(o1), np.asarray(o2))
