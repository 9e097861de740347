"""Tests: wolf activation flows (logdet vs exact autodiff Jacobian,
invertibility), local ResNet encoders, FlowDeQuantizer, wolf nnet blocks,
MovingBatchNorm (SURVEY.md §2.5 parity rows)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows import wolf_dequant as wd
from indm_tpu.flows import wolf_nnet as wn
from indm_tpu.flows.resflow import MovingBatchNorm1d, MovingBatchNorm2d


FLOWS = [
    ("identity", wd.identity_flow, {}),
    ("sigmoid", wd.sigmoid_flow, {}),
    ("elu", lambda x, reverse=False: wd.elu_flow(x, 1.0, reverse), {}),
    ("leaky_relu",
     lambda x, reverse=False: wd.leaky_relu_flow(x, 0.1, reverse), {}),
    ("power_shrink",
     lambda x, reverse=False: wd.powshrink_flow(x, 2.0, reverse), {}),
]


@pytest.mark.parametrize("name,fn,_", FLOWS, ids=[f[0] for f in FLOWS])
def test_activation_flow_roundtrip(name, fn, _):
  x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 3, 2)) * 1.5
  y, ld = fn(x)
  x2, ld_inv = fn(y, reverse=True)
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-4)


@pytest.mark.parametrize("name,fn,_", FLOWS, ids=[f[0] for f in FLOWS])
def test_activation_flow_logdet_exact(name, fn, _):
  # elementwise flow: logdet == sum log |f'(x_i)|, check vs autodiff
  x = jax.random.normal(jax.random.PRNGKey(1), (3, 5)) * 1.5
  if name == "power_shrink":
    # derivative is discontinuous at |x|=1; keep away from the kink
    x = jnp.where(jnp.abs(jnp.abs(x) - 1.0) < 0.1, x + 0.3, x)
  _, ld = fn(x)
  dfdx = jax.vmap(jax.vmap(jax.grad(lambda v: fn(v[None, None])[0][0, 0])))(x)
  expect = jnp.sum(jnp.log(jnp.abs(dfdx) + 1e-12), axis=-1)
  np.testing.assert_allclose(np.asarray(ld), np.asarray(expect), atol=1e-4)


def test_local_encoder_bn_shape():
  enc = wd.LocalResNetEncoderBN(levels=2, hidden_planes=[8, 16],
                                out_planes=4, activation="elu")
  x = jnp.zeros((2, 16, 16, 3))
  vs = enc.init(jax.random.PRNGKey(0), x, train=False)
  y = enc.apply(vs, x, train=False)
  assert y.shape == (2, 16, 16, 4)  # back to input resolution


def test_local_encoder_gn_shape():
  enc = wd.LocalResNetEncoderGN(levels=2, hidden_planes=[8, 16],
                                out_planes=4, num_groups=[2, 4],
                                activation="elu")
  x = jnp.zeros((2, 16, 16, 3))
  vs = enc.init(jax.random.PRNGKey(0), x, train=False)
  y = enc.apply(vs, x, train=False)
  assert y.shape == (2, 16, 16, 4)


def test_flow_dequantizer():
  dq = wd.FlowDeQuantizer(
      encoder_params={"type": "local_resnet_bn", "levels": 1,
                      "in_planes": 3, "hidden_planes": [8], "out_planes": 4,
                      "activation": "elu"},
      flow_params={"type": "glow", "levels": 2, "num_steps": [1, 1],
                   "factors": [], "in_channels": 3,
                   "hidden_channels": [8, 16], "h_channels": 4,
                   "h_type": "local_linear", "activation": "elu",
                   "inverse": False, "transform": "affine",
                   "prior_transform": "affine", "alpha": 1.0,
                   "coupling_type": "conv"})
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
  vs = dq.init({"params": jax.random.PRNGKey(1),
                "sample": jax.random.PRNGKey(2)}, x, train=False)
  u, log_post = dq.apply(vs, x, train=False,
                         rngs={"sample": jax.random.PRNGKey(3)})
  assert u.shape == (2, 1, 8, 8, 3)
  assert log_post.shape == (2, 1)
  assert np.isfinite(np.asarray(log_post)).all()
  u = np.asarray(u)
  assert (u > 0).all() and (u < 1).all()  # sigmoid output in (0,1)


def test_multihead_attention_shapes():
  attn = wn.MultiHeadAttention(model_dim=16, heads=4)
  q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
  vs = attn.init(jax.random.PRNGKey(1), q, train=False)
  out = attn.apply(vs, q, train=False)
  assert out.shape == (2, 5, 16)
  assert np.isfinite(np.asarray(out)).all()


def test_multihead_attention_2d_residual():
  attn = wn.MultiHeadAttention2d(channels=8, heads=2)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
  vs = attn.init(jax.random.PRNGKey(1), x, train=False)
  out = attn.apply(vs, x, train=False)
  assert out.shape == x.shape
  # residual structure: zeroing the qkv projection recovers the input
  zeroed = jax.tree_util.tree_map(jnp.zeros_like, vs)
  np.testing.assert_allclose(np.asarray(attn.apply(zeroed, x, train=False)),
                             np.asarray(x), atol=1e-6)


def test_positional_encoding_table():
  tab = wn.positional_encoding_table(16, 8, padding_idx=0)
  assert tab.shape == (16, 8)
  np.testing.assert_allclose(tab[0], 0.0)
  # position 1: first half sin, second half cos => cos block near 1
  assert (tab[1, 4:] > 0.4).all()


def test_adain2d_zero_init_is_instance_norm():
  ada = wn.AdaIN2d(in_channels=4)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 4)) * 3 + 1
  h = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
  vs = ada.init(jax.random.PRNGKey(2), x, h)
  out = np.asarray(ada.apply(vs, x, h))
  # zero-initialized modulation -> plain instance norm
  np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)
  np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_conv_transpose_weight_norm():
  m = wn.ConvTransposeWeightNorm(features=6, kernel_size=(3, 3),
                                 strides=(2, 2))
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
  vs = m.init(jax.random.PRNGKey(1), x)
  y = m.apply(vs, x)
  assert y.shape == (2, 8, 8, 6)


def test_moving_batchnorm_2d_roundtrip():
  bn = MovingBatchNorm2d(num_ch=3)
  params = bn.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3)) * 2 + 5
  # train forward uses batch mean; update running stats functionally
  y, lp = bn.forward(params, x, jnp.zeros((8,)), train=True)
  np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(lp), 0.0)  # pure shift: logdet 0
  params = bn.update_stats(params, x)
  assert int(params["step"]) == 1
  # after many updates the running mean converges to the batch mean
  for _ in range(200):
    params = bn.update_stats(params, x)
  y_eval, _ = bn.forward(params, x, None, train=False)
  x_rec, _ = bn.inverse(params, y_eval, None)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_moving_batchnorm_1d():
  bn = MovingBatchNorm1d(num_ch=5)
  params = bn.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (16, 5)) + 3
  y, _ = bn.forward(params, x, None, train=True)
  np.testing.assert_allclose(np.asarray(y).mean(axis=0), 0.0, atol=1e-5)


def test_nbits_preprocess_postprocess_roundtrip():
  from indm_tpu.flows import wolf_extras as we
  x = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3)),
                  jnp.float32)
  for n_bits in (8, 5):
    z = we.preprocess(x, n_bits)
    assert float(z.min()) >= -1.0 and float(z.max()) <= 1.0
    back = we.postprocess(z, n_bits)
    # quantization error bounded by one bin of 2^n_bits levels
    assert float(jnp.abs(back - x).max()) <= 256.0 / 2 ** n_bits / 255.0 + 1e-5


def test_nbits_preprocess_noise_shape():
  from indm_tpu.flows import wolf_extras as we
  x = jnp.zeros((2, 4, 4, 3))
  noise = jnp.zeros((2, 3, 4, 4, 3))
  z = we.preprocess(x, 8, noise=noise)
  assert z.shape == (2, 3, 4, 4, 3)
