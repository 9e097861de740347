"""Fused bias-add + scaled leaky-ReLU.

TPU-native equivalent of the reference CUDA kernel
(`/root/reference/op/fused_bias_act_kernel.cu:19`, Python wrapper
`op/fused_act.py:74-97`). On TPU this elementwise chain is fused into the
surrounding computation by XLA automatically; the function exists for API
parity (it is imported at `op/__init__.py:1` in the reference and required
by StyleGAN2-style layers) and as a Pallas fusion target.
"""

import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)):
  """`out = leaky_relu(x + bias) * scale` (`op/fused_act.py:87-94`).

  x: NHWC (bias broadcasts over the trailing channel axis) or any shape whose
  last axis is channels.
  """
  if bias is not None:
    x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
  return jax.nn.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLU:
  """Callable matching the reference module form (`op/fused_act.py:74-84`)."""

  def __init__(self, channel, negative_slope=0.2, scale=math.sqrt(2.0)):
    self.bias = jnp.zeros((channel,))
    self.negative_slope = negative_slope
    self.scale = scale

  def __call__(self, x):
    return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)
