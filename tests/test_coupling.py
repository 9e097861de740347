"""Coupling blocks / elementwise transforms: invertibility + log-det vs
autodiff Jacobian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows import coupling as cpl
from indm_tpu.flows import resflow as rf


def _exact_logdet(fn, x):
  """log|det d fn(x)/dx| per example via full Jacobian (tiny shapes)."""
  def one(xi):
    f = lambda v: fn(v.reshape((1,) + x.shape[1:])).reshape(-1)
    jac = jax.jacfwd(f)(xi.reshape(-1))
    sign, ld = jnp.linalg.slogdet(jac)
    return ld
  return jax.vmap(one)(x)


@pytest.mark.parametrize("block_cls,kw", [
    (cpl.ChannelCouplingBlock, {"mask_type": "channel0"}),
    (cpl.ChannelCouplingBlock, {"mask_type": "channel1"}),
])
def test_channel_coupling_roundtrip_and_logdet(block_cls, kw):
  net = cpl.ConvNet(2, 4, 8, (3, 1, 3), act="elu")
  block = block_cls(4, net, **kw)
  params = block.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 4))
  y, logpx = block.forward(params, x, jnp.zeros(3))
  x_rec, logpx2 = block.inverse(params, y, logpx)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(logpx2), 0.0, atol=1e-5)
  # logpx = -logdet by convention; compare against the exact Jacobian
  ld = _exact_logdet(
      lambda v: block.forward(params, v, None)[0], x)
  np.testing.assert_allclose(np.asarray(-logpx), np.asarray(ld), atol=1e-4)


def test_masked_coupling_roundtrip_and_logdet():
  net = cpl.ConvNet(3, 6, 8, (3, 1, 3), act="elu")
  block = cpl.MaskedCouplingBlock(3, net, mask_type="checkerboard0")
  params = block.init(jax.random.PRNGKey(2))
  x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
  y, logpx = block.forward(params, x, jnp.zeros(2))
  x_rec, logpx2 = block.inverse(params, y, logpx)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(logpx2), 0.0, atol=1e-5)
  ld = _exact_logdet(lambda v: block.forward(params, v, None)[0], x)
  np.testing.assert_allclose(np.asarray(-logpx), np.asarray(ld), atol=1e-4)


def test_logit_transform_roundtrip_logdet():
  t = cpl.LogitTransform(alpha=0.05)
  x = jax.random.uniform(jax.random.PRNGKey(4), (2, 3, 3, 2)) * 0.8 + 0.1
  y, logpx = t.forward({}, x, jnp.zeros(2))
  x_rec, logpx2 = t.inverse({}, y, logpx)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(logpx2), 0.0, atol=1e-4)
  ld = _exact_logdet(lambda v: t.forward({}, v, None)[0], x)
  np.testing.assert_allclose(np.asarray(-logpx), np.asarray(ld), atol=1e-4)


def test_coupling_residual_flow_roundtrip():
  flow = rf.ResidualFlow(image_hw=8, in_ch=2, n_blocks=(2, 2),
                         intermediate_dim=8, block_type="coupling",
                         activation_fn="elu")
  params = flow.init(jax.random.PRNGKey(5))
  x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 2))
  z, logpx = flow.fwdpass(params, x, rng=jax.random.PRNGKey(7))
  x_rec, _ = flow.bwdpass(params, z)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_fc_lipschitz_net_iresblock():
  nnet = rf.LipschitzFCNet((4, 4, 2), idim=16, nhidden=2, coeff=0.98,
                           act="sin")
  block = rf.IResBlock(nnet)
  params = block.init(jax.random.PRNGKey(8))
  x = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 4, 2))
  y, _ = block.forward(params, x, rng=jax.random.PRNGKey(10))
  x_rec = block._inverse_fixed_point(params, y, None)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


def test_scanned_blocks_match_unrolled():
  """ScannedIResBlocks(scan) must equal running the blocks sequentially with
  the same params and rngs."""
  nnet = rf.LipschitzNNet(in_ch=2, idim=8, kernels=(3, 1, 3), coeff=0.98,
                          act="sin", preact=True)
  block = rf.IResBlock(nnet)
  scanned = rf.ScannedIResBlocks(block, 3)
  params = scanned.init(jax.random.PRNGKey(11))
  x = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, 2))
  rng = jax.random.PRNGKey(13)
  y_s, lp_s = scanned.forward(params, x, jnp.zeros(2), rng=rng, train=False)

  keys = jax.random.split(rng, 3)
  y_u, lp_u = x, jnp.zeros(2)
  for i in range(3):
    p_i = jax.tree_util.tree_map(lambda a: a[i], params)
    y_u, lp_u = block.forward(p_i, y_u, lp_u, rng=keys[i], train=False)
  np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_u), atol=1e-5)
  np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_u), atol=1e-4)
