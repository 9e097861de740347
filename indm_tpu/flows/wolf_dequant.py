"""Wolf variational dequantization + elementwise activation flows.

TPU-native (NHWC, flax.linen) re-design of:
  * `flow_models/wolf/flows/activation.py` — Identity/Powshrink/LeakyReLU/
    ELU/Sigmoid elementwise flows with exact log-dets;
  * `flow_models/wolf/modules/encoders/local_encoder.py` — strided ResNet
    down-pyramid + transposed-conv up-pyramid producing a spatial
    conditioning map;
  * `flow_models/wolf/modules/dequantization/dequantizer.py:75-152` —
    FlowDeQuantizer: u = sigmoid(flow(eps | encoder(x))), with the Gaussian
    base log-posterior minus the flow log-det.

The dequantizer is disabled on the INDM default path (WolfCore.from_params
sets it to None, `wolf.py:137-140`) but backs the `"dequantizer": {"type":
"flow"}` wolf presets (e.g. cifar10/glow/glow-base-var.json).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from indm_tpu.flows.wolf import _ACTS
from indm_tpu.flows.wolf_glow import flow_by_name, register_flow


# ---------------------------------------------------------------------------
# Elementwise activation flows (`flows/activation.py`)
# ---------------------------------------------------------------------------


def _batch_sum(x):
  return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def identity_flow(x, reverse: bool = False):
  """`activation.py:13-58`."""
  return x, jnp.zeros((x.shape[0],), x.dtype)


def sigmoid_flow(x, reverse: bool = False):
  """`activation.py` SigmoidFlow: y = sigmoid(x),
  logdet = sum log sigma'(x) = sum(logsig(x) + logsig(-x))."""
  if not reverse:
    out = jax.nn.sigmoid(x)
    ld = _batch_sum(jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x))
  else:
    eps = 1e-12
    xc = jnp.clip(x, eps, 1.0 - eps)
    out = jnp.log(xc) - jnp.log1p(-xc)
    ld = -_batch_sum(jnp.log(xc) + jnp.log1p(-xc))
  return out, ld


def elu_flow(x, alpha: float = 1.0, reverse: bool = False):
  """`activation.py` ELUFlow: y = elu(x); d/dx = alpha*e^x for x<0."""
  neg = (x < 0.0).astype(x.dtype)
  if not reverse:
    out = jnp.where(x < 0, alpha * jnp.expm1(x), x)
    ld = _batch_sum(neg * (x + math.log(alpha)))
  else:
    out = jnp.where(x < 0, jnp.log1p(x / alpha), x)
    ld = -_batch_sum(neg * (out + math.log(alpha)))
  return out, ld


def leaky_relu_flow(x, negative_slope: float = 0.1, reverse: bool = False):
  """`activation.py` LeakyReLUFlow."""
  slope = negative_slope if not reverse else 1.0 / negative_slope
  out = jnp.where(x < 0, x * slope, x)
  ld = _batch_sum((x < 0.0).astype(x.dtype)) * math.log(slope)
  return out, ld


def powshrink_flow(x, exponent: float = 2.0, reverse: bool = False):
  """`activation.py` PowshrinkFlow: |x|<1 -> sign(x)*|x|^p."""
  sign = jnp.sign(x)
  a = jnp.abs(x)
  mask = (a < 1.0).astype(x.dtype)
  p = exponent if not reverse else 1.0 / exponent
  out = sign * jnp.where(a < 1.0, a ** p, a)
  log_e = math.log(exponent) if not reverse else -math.log(exponent)
  ld = _batch_sum(mask * ((p - 1.0) * jnp.log(a + 1e-8) + log_e))
  return out, ld


class _ElemwiseFlow(nn.Module):
  """Adapter exposing an elementwise flow through the wolf flow registry
  interface (`Flow.by_name`, `flows/flow.py:106-118`)."""
  fn_name: str = "identity"
  alpha: float = 1.0
  exponent: float = 2.0
  negative_slope: float = 0.1
  h_channels: int = 0

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    if self.fn_name == "identity":
      return identity_flow(x, reverse)
    if self.fn_name == "sigmoid":
      return sigmoid_flow(x, reverse)
    if self.fn_name == "elu":
      return elu_flow(x, self.alpha, reverse)
    if self.fn_name == "leaky_relu":
      return leaky_relu_flow(x, self.negative_slope, reverse)
    if self.fn_name == "power_shrink":
      return powshrink_flow(x, self.exponent, reverse)
    raise NotImplementedError(self.fn_name)


@register_flow("identity")
class IdentityFlow(_ElemwiseFlow):
  @classmethod
  def from_params(cls, params: Dict):
    params.pop("inverse", None)
    return cls(fn_name="identity", **params)


@register_flow("sigmoid")
class SigmoidFlow(_ElemwiseFlow):
  @classmethod
  def from_params(cls, params: Dict):
    params.pop("inverse", None)
    return cls(fn_name="sigmoid", **params)


@register_flow("elu")
class ELUFlow(_ElemwiseFlow):
  @classmethod
  def from_params(cls, params: Dict):
    params.pop("inverse", None)
    return cls(fn_name="elu", **params)


@register_flow("leaky_relu")
class LeakyReLUFlow(_ElemwiseFlow):
  @classmethod
  def from_params(cls, params: Dict):
    params.pop("inverse", None)
    return cls(fn_name="leaky_relu", **params)


@register_flow("power_shrink")
class PowshrinkFlow(_ElemwiseFlow):
  @classmethod
  def from_params(cls, params: Dict):
    params.pop("inverse", None)
    return cls(fn_name="power_shrink", **params)


# ---------------------------------------------------------------------------
# Local ResNet encoders (`modules/encoders/local_encoder.py`)
# ---------------------------------------------------------------------------


class DeResNetBlockBN(nn.Module):
  """Transposed-conv residual block with BatchNorm
  (`nnet/resnets/resnet_batchnorm.py:80-160`), NHWC. stride=2 doubles the
  spatial dims (SAME transposed conv, the output_padding=1 torch case)."""
  planes: int
  stride: int = 1
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    act = _ACTS[self.activation]
    inp = x.shape[-1]
    residual = x
    h = nn.ConvTranspose(self.planes, (3, 3), strides=(self.stride,) * 2,
                         padding="SAME", use_bias=False)(x)
    h = nn.BatchNorm(use_running_average=not train)(h)
    h = act(h)
    h = nn.ConvTranspose(self.planes, (3, 3), padding="SAME",
                         use_bias=False)(h)
    h = nn.BatchNorm(use_running_average=not train)(h)
    if self.stride != 1 or inp != self.planes:
      residual = nn.ConvTranspose(self.planes, (1, 1),
                                  strides=(self.stride,) * 2,
                                  padding="SAME", use_bias=False)(x)
      residual = nn.BatchNorm(use_running_average=not train)(residual)
    return act(h + residual)


class DeResNetBlockGN(nn.Module):
  """GroupNorm variant (`nnet/resnets/resnet_groupnorm.py`)."""
  planes: int
  num_groups: int
  stride: int = 1
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    act = _ACTS[self.activation]
    inp = x.shape[-1]
    residual = x
    h = nn.ConvTranspose(self.planes, (3, 3), strides=(self.stride,) * 2,
                         padding="SAME", use_bias=False)(x)
    h = nn.GroupNorm(num_groups=self.num_groups)(h)
    h = act(h)
    h = nn.ConvTranspose(self.planes, (3, 3), padding="SAME",
                         use_bias=False)(h)
    h = nn.GroupNorm(num_groups=self.num_groups)(h)
    if self.stride != 1 or inp != self.planes:
      residual = nn.ConvTranspose(self.planes, (1, 1),
                                  strides=(self.stride,) * 2,
                                  padding="SAME", use_bias=False)(x)
      residual = nn.GroupNorm(num_groups=self.num_groups)(residual)
    return act(h + residual)


class LocalResNetEncoderBN(nn.Module):
  """Down-pyramid (2 blocks/level, strides [1,2]) then up-pyramid back to the
  input resolution with `out_planes` channels
  (`local_encoder.py:12-52`)."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    from indm_tpu.flows.wolf import ResNetBlockBN
    assert len(self.hidden_planes) == self.levels
    for level in range(self.levels):
      hc = self.hidden_planes[level]
      x = ResNetBlockBN(hc, stride=1, activation=self.activation)(x, train)
      x = ResNetBlockBN(hc, stride=2, activation=self.activation)(x, train)
    planes = [self.out_planes] + list(self.hidden_planes)
    for level in reversed(range(self.levels)):
      hc = planes[level]
      x = DeResNetBlockBN(x.shape[-1], stride=1,
                          activation=self.activation)(x, train)
      x = DeResNetBlockBN(hc, stride=2, activation=self.activation)(x, train)
    return x


class LocalResNetEncoderGN(nn.Module):
  """GroupNorm variant (`local_encoder.py:55-97`)."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  num_groups: Sequence[int]
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    assert len(self.hidden_planes) == self.levels
    act = _ACTS[self.activation]

    def gn_block(x, planes, ng, stride):
      inp = x.shape[-1]
      residual = x
      h = nn.Conv(planes, (3, 3), strides=(stride,) * 2, padding="SAME",
                  use_bias=False)(x)
      h = nn.GroupNorm(num_groups=ng)(h)
      h = act(h)
      h = nn.Conv(planes, (3, 3), padding="SAME", use_bias=False)(h)
      h = nn.GroupNorm(num_groups=ng)(h)
      if stride != 1 or inp != planes:
        residual = nn.Conv(planes, (1, 1), strides=(stride,) * 2,
                           use_bias=False)(x)
        residual = nn.GroupNorm(num_groups=ng)(residual)
      return act(h + residual)

    for level in range(self.levels):
      hc = self.hidden_planes[level]
      ng = self.num_groups[level]
      x = gn_block(x, hc, ng, 1)
      x = gn_block(x, hc, ng, 2)
    planes = [self.out_planes] + list(self.hidden_planes)
    for level in reversed(range(self.levels)):
      hc = planes[level]
      ng = self.num_groups[level]
      x = DeResNetBlockGN(x.shape[-1], ng, stride=1,
                          activation=self.activation)(x, train)
      x = DeResNetBlockGN(hc, ng, stride=2,
                          activation=self.activation)(x, train)
    return x


def make_local_encoder(params: Dict) -> nn.Module:
  p = dict(params)
  kind = p.pop("type")
  p.pop("in_planes", None)  # inferred from the input in NHWC flax
  if kind == "local_resnet_bn":
    return LocalResNetEncoderBN(**p)
  if kind == "local_resnet_gn":
    return LocalResNetEncoderGN(**p)
  raise NotImplementedError(f"encoder type {kind}")


# ---------------------------------------------------------------------------
# FlowDeQuantizer (`dequantization/dequantizer.py:75-152`)
# ---------------------------------------------------------------------------


class FlowDeQuantizer(nn.Module):
  """u = sigmoid(core_flow(eps | h=encoder(x))), eps ~ N(0, I).

  `dequantize` returns (u, log_posteriors):
    log q(u|x) = log N(eps; 0, I) - logdet[flow o sigmoid](eps)
  with u in (0,1)^D added to the integer pixels by the caller
  (`dequantizer.py:82-99`)."""
  encoder_params: Dict
  flow_params: Dict

  def setup(self):
    self.encoder = make_local_encoder(self.encoder_params)
    fp = dict(self.flow_params)
    kind = fp.pop("type")
    fp.pop("inverse", None)
    fp.pop("coupling_type", None)
    if "num_groups" in fp and fp.get("normalize") != "group_norm":
      fp.pop("num_groups")
    self.core = flow_by_name(kind).from_params(fp)

  def dequantize(self, x, train: bool = True, nsamples: int = 1):
    batch = x.shape[0]
    h = self.encoder(x, train=train)
    eps = jax.random.normal(self.make_rng("sample"),
                            (batch * nsamples,) + x.shape[1:])
    if nsamples > 1:
      h = jnp.repeat(h, nsamples, axis=0)
    u, logdet = self.core(eps, h=h, train=train)
    u, ld_sig = sigmoid_flow(u)
    logdet = logdet + ld_sig
    d = math.prod(x.shape[1:])
    log_post = -0.5 * (_batch_sum(eps ** 2) + math.log(2 * math.pi) * d)
    log_post = log_post - logdet
    return (u.reshape((batch, nsamples) + x.shape[1:]),
            log_post.reshape(batch, nsamples))

  def __call__(self, x, train: bool = True):
    return self.dequantize(x, train=train)
