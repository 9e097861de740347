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


def test_ncsnpp_mixed_precision_close_to_f32():
  """model.mixed_precision: bf16 conv/attention compute with f32 master
  params must return f32 outputs close to the pure-f32 forward (TPU-first
  headline config; no reference counterpart)."""
  cfg = tiny(get_config("vp/CIFAR10/indm_nll"))
  rng = jax.random.PRNGKey(0)
  module, variables = create_model(cfg, rng)
  x = jax.random.normal(rng, (2, 16, 16, 3))
  t = jnp.asarray([0.1, 0.9]) * 999
  cfg.model.mixed_precision = False
  y32 = np.asarray(module.apply(variables, x, t, train=False))
  cfg.model.mixed_precision = True
  try:
    y16 = np.asarray(module.apply(variables, x, t, train=False))
  finally:
    cfg.model.mixed_precision = False
  assert y16.dtype == np.float32
  scale = np.abs(y32).max() + 1e-12
  assert np.abs(y32 - y16).max() / scale < 2e-2


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


def test_fast_dropout_semantics():
  """`model.fast_dropout` (hardware-rng masks): the layer keeps ~keep_prob
  of the entries, scales survivors by 1/keep in the input dtype, is
  deterministic per key, and the layer defaults to flax-bitwise behavior
  when the scope is off."""
  import flax.linen as nn

  from indm_tpu.models import layers

  x = jnp.asarray(np.random.default_rng(0).normal(
      size=(16, 8, 8, 32)).astype(np.float32))

  class Blk(nn.Module):
    @nn.compact
    def __call__(self, x):
      return layers.Dropout(0.1)(x, deterministic=False)

  class Ref(nn.Module):
    @nn.compact
    def __call__(self, x):
      return nn.Dropout(0.1)(x, deterministic=False)

  key = jax.random.PRNGKey(7)
  # scope off: bit-identical to flax nn.Dropout (same rng fold, same mask)
  y_ref = Ref().apply({}, x, rngs={"dropout": key})
  y_def = Blk().apply({}, x, rngs={"dropout": key})
  assert np.array_equal(np.asarray(y_ref), np.asarray(y_def))

  with layers.fast_dropout_scope(True):
    y1 = Blk().apply({}, x, rngs={"dropout": key})
    y2 = Blk().apply({}, x, rngs={"dropout": key})
    y3 = Blk().apply({}, x, rngs={"dropout": jax.random.PRNGKey(8)})
  np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
  assert not np.array_equal(np.asarray(y1), np.asarray(y3))
  kept = np.asarray(y1) != 0
  assert 0.85 < kept.mean() < 0.95
  np.testing.assert_allclose(np.asarray(y1)[kept],
                             (np.asarray(x) / 0.9)[kept], rtol=1e-6)


# ---------------------------------------------------------------------------
# Normalization zoo (`/root/reference/models/normalization.py:22-155`)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("norm", ["InstanceNorm++", "InstanceNorm",
                                  "VarianceNorm", "NoneNorm"])
def test_class_conditional_ncsn_forward_all_norms(norm):
  """The class-conditional NCSNv1 must run with EVERY conditional
  normalization variant (the reference ships the classes at
  `normalization.py:43-155`; its own dispatch raises for all but
  InstanceNorm++ — ours constructs them)."""
  from indm_tpu.models.ncsnv2 import NCSN

  cfg = tiny(get_config("vp/CIFAR10/indm_nll"), img=16, nf=8)
  cfg.model.normalization = norm
  cfg.model.num_classes = 10
  cfg.model.num_scales = 10
  cfg.model.nonlinearity = "elu"
  module = NCSN(config=cfg)
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
  labels = jnp.asarray([0, 7])
  variables = module.init(jax.random.PRNGKey(1), x, labels, train=False)
  out = module.apply(variables, x, labels, train=False)
  assert out.shape == x.shape
  assert np.isfinite(np.asarray(out)).all()
  # conditioning is real: different labels change the output
  out2 = module.apply(variables, x, jnp.asarray([3, 1]), train=False)
  assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_conditional_batchnorm2d_standalone():
  """ConditionalBatchNorm2d (`normalization.py:43-66`): batch_stats
  threading + class-conditional affine."""
  from indm_tpu.models.normalization import ConditionalBatchNorm2d

  m = ConditionalBatchNorm2d(num_classes=4)
  x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6)) * 3 + 1
  y = jnp.asarray([0, 1, 2, 3])
  variables = m.init(jax.random.PRNGKey(1), x, y, train=True)
  out, mutated = m.apply(variables, x, y, train=True,
                         mutable=["batch_stats"])
  assert out.shape == x.shape
  assert np.isfinite(np.asarray(out)).all()
  # eval path uses the (updated) running stats
  v2 = {"params": variables["params"],
        "batch_stats": mutated["batch_stats"]}
  out_eval = m.apply(v2, x, y, train=False)
  assert np.isfinite(np.asarray(out_eval)).all()


def test_conditional_none_and_variance_norm_semantics():
  from indm_tpu.models.normalization import (ConditionalNoneNorm2d,
                                             ConditionalVarianceNorm2d,
                                             NoneNorm2d)

  x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
  y = jnp.asarray([1, 0])
  m = ConditionalNoneNorm2d(num_classes=3)
  v = m.init(jax.random.PRNGKey(3), x, y)
  out = m.apply(v, x, y)
  # gamma * x + beta with beta initialized to 0 -> out/x constant per (b, c)
  ratio = np.asarray(out) / np.asarray(x)
  np.testing.assert_allclose(ratio.std(axis=(1, 2)), 0.0, atol=1e-5)

  mv = ConditionalVarianceNorm2d(num_classes=3)
  vv = mv.init(jax.random.PRNGKey(4), x, y)
  outv = mv.apply(vv, x, y)
  # variance-only normalization: spatial mean NOT removed
  assert np.abs(np.asarray(outv).mean()) > 1e-4

  nn_id = NoneNorm2d()
  vi = nn_id.init(jax.random.PRNGKey(5), x)
  np.testing.assert_array_equal(np.asarray(nn_id.apply(vi, x)),
                                np.asarray(x))
