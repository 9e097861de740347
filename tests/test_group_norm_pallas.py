"""Parity tests for the fused GroupNorm(+act) Pallas kernel pair.

Oracle: `group_norm_act_reference` (pure jnp mirroring flax
`nn.GroupNorm` f32 statistics + activation). The custom-VJP backward
kernel (accumulator init across grid cells, swish chain rule) is checked
against `jax.grad` of the oracle. Kernels run in interpret mode on CPU
(the repo convention for Pallas tests: test_neumann_pallas.py,
test_fused_block.py); on-TPU correctness is asserted by `bench.py`.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.models import layers
from indm_tpu.ops import group_norm_pallas as gnp


def _mk(n, h, w, c, dtype, seed=0):
  rng = np.random.default_rng(seed)
  x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32),
                  dtype=dtype)
  scale = jnp.asarray(rng.normal(1.0, 0.2, size=(c,)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0.0, 0.2, size=(c,)).astype(np.float32))
  return x, scale, bias


# Multiple (num_groups, hw) tilings: grid of 1 (nb=n), grid > 1 (nb < n),
# hw > 512 so nb=1, and a non-power-of-two group count.
GEOMS = [
    # (n, h, w, c, num_groups)
    (4, 8, 8, 32, 8),      # nb=4 -> single grid cell
    (6, 16, 16, 64, 16),   # nb=2 -> 3 grid cells
    (3, 32, 32, 16, 4),    # hw=1024>512 -> nb=1, 3 cells
    (2, 4, 4, 24, 6),      # C not a power of two
]


@pytest.mark.parametrize("act", ["none", "swish"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("geom", GEOMS)
def test_forward_parity(geom, dtype, act):
  n, h, w, c, g = geom
  x, scale, bias = _mk(n, h, w, c, dtype)
  y = gnp.fused_group_norm_act(x, scale, bias, g, act=act, interpret=True)
  y_ref = gnp.group_norm_act_reference(x, scale, bias, g, act=act)
  assert y.dtype == x.dtype
  tol = 1e-5 if dtype == jnp.float32 else 2e-2
  np.testing.assert_allclose(np.asarray(y, np.float32),
                             np.asarray(y_ref, np.float32),
                             atol=tol, rtol=tol)


@pytest.mark.parametrize("act", ["none", "swish"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("geom", GEOMS[:3])
def test_backward_parity(geom, dtype, act):
  n, h, w, c, g = geom
  x, scale, bias = _mk(n, h, w, c, dtype, seed=1)
  # a fixed cotangent-shaping weight makes the scalar loss exercise dy != 1
  wts = jnp.asarray(
      np.random.default_rng(2).normal(size=(n, h, w, c)).astype(np.float32))

  def loss_kernel(x, s, b):
    y = gnp.fused_group_norm_act(x, s, b, g, act=act, interpret=True)
    return jnp.sum(y.astype(jnp.float32) * wts)

  def loss_ref(x, s, b):
    y = gnp.group_norm_act_reference(x, s, b, g, act=act)
    return jnp.sum(y.astype(jnp.float32) * wts)

  gx, gs, gb = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, scale, bias)
  rx, rs, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
  assert gx.dtype == x.dtype
  tol = 1e-4 if dtype == jnp.float32 else 1e-1
  np.testing.assert_allclose(np.asarray(gx, np.float32),
                             np.asarray(rx, np.float32),
                             atol=tol, rtol=tol)
  # parameter grads accumulate across grid cells (pl.when-gated init)
  np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                             atol=tol * 10, rtol=tol)
  np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                             atol=tol * 10, rtol=tol)


def test_layers_groupnorm_scope_equivalence():
  """layers.GroupNorm: fused scope on (interpret kernel) == scope off
  (verbatim flax math), same params, and the param tree keeps the plain
  flax naming so checkpoints interchange."""
  x = jnp.asarray(np.random.default_rng(3).normal(
      size=(2, 8, 8, 32)).astype(np.float32))

  class M(nn.Module):
    @nn.compact
    def __call__(self, x):
      return layers.group_norm_act(x, jax.nn.swish, num_groups=8)

  m = M()
  with layers.fused_groupnorm_scope(False):
    params = m.init(jax.random.PRNGKey(0), x)
    y_off = m.apply(params, x)
  flat = jax.tree_util.tree_leaves_with_path(params)
  names = {jax.tree_util.keystr(p) for p, _ in flat}
  assert any("GroupNorm_0" in s and "scale" in s for s in names), names
  with layers.fused_groupnorm_scope(True):
    y_on = m.apply(params, x)
  np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                             atol=1e-5, rtol=1e-5)


def test_layers_groupnorm_grad_scope_equivalence():
  x = jnp.asarray(np.random.default_rng(4).normal(
      size=(2, 8, 8, 32)).astype(np.float32))

  class M(nn.Module):
    @nn.compact
    def __call__(self, x):
      return layers.group_norm_act(x, jax.nn.swish, num_groups=8)

  m = M()
  with layers.fused_groupnorm_scope(False):
    params = m.init(jax.random.PRNGKey(0), x)

  def loss(params, x, fused):
    with layers.fused_groupnorm_scope(fused):
      return jnp.sum(m.apply(params, x) ** 2)

  g_off = jax.grad(loss)(params, x, False)
  g_on = jax.grad(loss)(params, x, True)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              atol=2e-4, rtol=2e-4),
      g_off, g_on)


def test_ncsnpp_fused_groupnorm_config_parity():
  """NCSNpp forward with model.fused_groupnorm on == off (interpret
  kernels on CPU), exercising every group_norm_act call site."""
  from indm_tpu.configs import get_config
  from indm_tpu.models import create_model

  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.model.nf = 16
  cfg.model.num_res_blocks = 1
  cfg.model.attn_resolutions = (8,)
  cfg.model.ch_mult = (1, 2)
  cfg.data.image_size = 16
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  x = jnp.asarray(np.random.default_rng(5).normal(
      size=(2, 16, 16, 3)).astype(np.float32))
  t = jnp.asarray([10.0, 500.0], jnp.float32)
  y_off = module.apply(variables, x, t, train=False)
  cfg.model.fused_groupnorm = True
  y_on = module.apply(variables, x, t, train=False)
  np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                             atol=5e-5, rtol=5e-5)
