"""upfirdn2d / FIR resampling tests (SURVEY.md §4(a,b)).

The fused XLA path is checked against `upfirdn2d_native`, the literal port
of the reference CPU oracle (`op/upfirdn2d.py:159-200`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import ops


def _rand(shape, seed=0):
  return jax.random.normal(jax.random.PRNGKey(seed), shape)


FIR_K = ops.setup_kernel([1, 3, 3, 1])


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 2)),
    (2, 1, (2, 1)),
    (1, 2, (2, 1)),
    (2, 2, (1, 1)),
    (1, 1, (0, 0)),
])
def test_upfirdn2d_matches_native(up, down, pad):
  x = _rand((2, 8, 8, 3))
  k = jnp.asarray(FIR_K)
  got = ops.upfirdn2d(x, k, up=up, down=down, pad=pad)
  want = ops.upfirdn2d_native(x, k, up, up, down, down,
                              pad[0], pad[1], pad[0], pad[1])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upfirdn2d_negative_padding():
  x = _rand((1, 8, 8, 2))
  k = jnp.asarray(FIR_K)
  got = ops.upfirdn2d(x, k, up=1, down=1, pad=(-1, 2))
  want = ops.upfirdn2d_native(x, k, 1, 1, 1, 1, -1, 2, -1, 2)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upsample_downsample_shapes_and_dc_gain():
  x = jnp.ones((2, 8, 8, 3))
  up = ops.upsample_2d(x, [1, 3, 3, 1], factor=2)
  dn = ops.downsample_2d(x, [1, 3, 3, 1], factor=2)
  assert up.shape == (2, 16, 16, 3)
  assert dn.shape == (2, 4, 4, 3)
  # FIR filters are normalized: constant inputs stay constant (interior).
  np.testing.assert_allclose(np.asarray(up[:, 4:12, 4:12]), 1.0, atol=1e-5)
  np.testing.assert_allclose(np.asarray(dn[:, 1:3, 1:3]), 1.0, atol=1e-5)


def test_upsample_conv_identity_kernel_equals_upsample():
  """With a 1x1 identity conv kernel, fused upsample_conv == FIR upsample
  (`up_or_down_sampling.py:72-141` with convW=1)."""
  x = _rand((2, 6, 6, 3), seed=1)
  w = jnp.eye(3).reshape(1, 1, 3, 3)
  got = ops.upsample_conv_2d(x, w, k=[1, 3, 3, 1])
  want = ops.upsample_2d(x, [1, 3, 3, 1], factor=2)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv_downsample_identity_kernel_equals_downsample():
  x = _rand((2, 8, 8, 3), seed=2)
  w = jnp.eye(3).reshape(1, 1, 3, 3)
  got = ops.conv_downsample_2d(x, w, k=[1, 3, 3, 1])
  want = ops.downsample_2d(x, [1, 3, 3, 1], factor=2)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upfirdn2d_gradient_matches_native():
  """AD through the fused conv must equal AD through the literal oracle —
  this covers the reference's hand-written backward (`op/upfirdn2d.py:111-116`)."""
  x = _rand((1, 6, 6, 2), seed=3)
  k = jnp.asarray(FIR_K)

  def f_fused(x):
    return jnp.sum(ops.upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

  def f_native(x):
    return jnp.sum(ops.upfirdn2d_native(x, k, 2, 2, 1, 1, 2, 1, 2, 1) ** 2)

  g1 = jax.grad(f_fused)(x)
  g2 = jax.grad(f_native)(x)
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_naive_resampling():
  x = jnp.arange(16.0).reshape(1, 4, 4, 1)
  up = ops.naive_upsample_2d(x, 2)
  assert up.shape == (1, 8, 8, 1)
  np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]), 0.0)
  dn = ops.naive_downsample_2d(up, 2)
  np.testing.assert_allclose(np.asarray(dn), np.asarray(x))


def test_fused_leaky_relu():
  x = _rand((2, 4, 4, 3), seed=4)
  b = jnp.asarray([0.5, -0.5, 0.0])
  got = ops.fused_leaky_relu(x, b)
  want = jax.nn.leaky_relu(x + b.reshape(1, 1, 1, 3), 0.2) * np.sqrt(2.0)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 2)), (1, 2, (2, 1)), (2, 1, (2, 1)),
])
def test_upfirdn2d_pallas_matches_native(up, down, pad):
  from indm_tpu.ops.upfirdn2d_pallas import upfirdn2d_pallas
  x = _rand((2, 8, 8, 3), seed=7)
  k = jnp.asarray(FIR_K)
  got = upfirdn2d_pallas(x, k, up=up, down=down, pad=pad, interpret=True)
  want = ops.upfirdn2d_native(x, k, up, up, down, down,
                              pad[0], pad[1], pad[0], pad[1])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
