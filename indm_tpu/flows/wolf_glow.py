"""Wolf generic image flows: Glow family + the multi-scale architecture.

Re-design of `/root/reference/flow_models/wolf/flows/` (glow.py,
multiscale_architecture.py, permutation.py, normalization.py,
couplings/coupling.py NICE2d + transforms) in flax.linen, NHWC. These back
the glow wolf JSON presets; the INDM experiments themselves only use the
`resflow` generator, so this module is the breadth/parity layer.

Conventions follow the wolf Flow protocol: every module's __call__ takes
(x, h=None, reverse=False) and returns (out, logdet[B]) where forward
logdet is log|det d out/d x| and backward returns the log-det of the
inverse map (`flows/flow.py:18-104`).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.flows.wolf import _ACTS, DenseWeightNorm

_FLOW_REGISTRY = {}


def register_flow(name):
  def _reg(cls):
    _FLOW_REGISTRY[name] = cls
    return cls
  return _reg


def flow_by_name(name):
  return _FLOW_REGISTRY[name]


# ---------------------------------------------------------------------------
# channel helpers (`flow_models/wolf/utils.py` squeeze2d/split2d family)
# ---------------------------------------------------------------------------


def squeeze2d(x, factor: int = 2):
  b, h, w, c = x.shape
  x = x.reshape(b, h // factor, factor, w // factor, factor, c)
  x = x.transpose(0, 1, 3, 5, 2, 4)
  return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(x, factor: int = 2):
  b, h, w, c4 = x.shape
  c = c4 // (factor * factor)
  x = x.reshape(b, h, w, c, factor, factor)
  x = x.transpose(0, 1, 4, 2, 5, 3)
  return x.reshape(b, h * factor, w * factor, c)


def split2d(x, z1_channels: int):
  return x[..., :z1_channels], x[..., z1_channels:]


def unsplit2d(xs):
  return jnp.concatenate(xs, axis=-1)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class Conv2dWeightNorm(nn.Module):
  """Weight-normalized conv (`nnet/weight_norm.py:43-82`), NHWC, with the
  reference's DATA-DEPENDENT init (`weight_norm.py:61-74`): at module.init
  the output is standardized per channel to `init_scale` (g scaled, bias
  absorbing the mean). init_scale=0 zero-initializes the output — the
  reference uses this for every coupling block's LAST layer
  (`couplings/blocks.py:47,120,152`) so couplings start near identity;
  without it, deep glow/macow inverses amplify until overflow."""
  features: int
  kernel: Tuple[int, int] = (3, 3)
  init_scale: float = 1.0

  @nn.compact
  def __call__(self, x):
    in_ch = x.shape[-1]
    shape = self.kernel + (in_ch, self.features)
    v = self.param("v", nn.initializers.normal(0.05), shape)
    vnorm = jnp.sqrt((v ** 2).sum(axis=(0, 1, 2))) + 1e-12

    conv = lambda w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.is_initializing():
      # g0 = ||v|| -> initial weight == v; standardize its output
      out0 = conv(v)
      mean = out0.mean(axis=(0, 1, 2))
      std = out0.std(axis=(0, 1, 2))
      inv = self.init_scale / (std + 1e-6)
      g_init = lambda rng: vnorm * inv
      b_init = lambda rng, shape: -mean * inv
    else:
      g_init = lambda rng: vnorm
      b_init = nn.initializers.zeros
    g = self.param("g", g_init)
    b = self.param("b", b_init, (self.features,))
    return conv(v * (g / vnorm)) + b


class NICEConvBlock(nn.Module):
  """conv3 -> act -> conv1 (+h) -> act -> weight-norm conv3
  (`couplings/blocks.py:51-110`)."""
  out_channels: int
  hidden_channels: int
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[int] = None

  @nn.compact
  def __call__(self, x, h=None, train: bool = True):
    act = _ACTS[self.activation]

    def norm(y):
      if self.normalize is None:
        return y
      if self.normalize == "batch_norm":
        return nn.BatchNorm(use_running_average=not train)(y)
      if self.normalize == "instance_norm":
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.var(y, axis=(1, 2), keepdims=True)
        y = (y - mean) / jnp.sqrt(var + 1e-5)
        s = self.param(f"in_scale_{y.shape[-1]}", nn.initializers.ones,
                       (y.shape[-1],))
        b = self.param(f"in_bias_{y.shape[-1]}", nn.initializers.zeros,
                       (y.shape[-1],))
        return y * s + b
      if self.normalize == "group_norm":
        return nn.GroupNorm(num_groups=self.num_groups)(y)
      raise ValueError(self.normalize)

    out = nn.Conv(self.hidden_channels, (3, 3), padding="SAME",
                  use_bias=False)(x)
    out = act(norm(out))
    out = nn.Conv(self.hidden_channels, (1, 1), use_bias=False)(out)
    out = norm(out)
    if h is not None:
      out = out + h
    out = act(out)
    # reference zero-inits the block's last layer (`blocks.py:120`):
    # couplings start near identity
    return Conv2dWeightNorm(self.out_channels, (3, 3), init_scale=0.0)(out)


class LocalLinearCondNet(nn.Module):
  """3x3 conv on a spatial conditioning map (`couplings/blocks.py:157-163`)."""
  out_channels: int

  @nn.compact
  def __call__(self, h, x=None):
    return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class GlobalLinearCondNet(nn.Module):
  """Dense on a global vector, broadcast spatially
  (`couplings/blocks.py:166-174`)."""
  out_channels: int

  @nn.compact
  def __call__(self, h, x=None):
    out = nn.Dense(self.out_channels)(h)
    return out[:, None, None, :]


class ActNorm2dFlow(nn.Module):
  """`flows/normalization.py:115-175`, with the reference's data-dependent
  init (`normalization.py:170-180`): at module.init the OUTPUT of the
  direction being traced is standardized per channel — the stabilizer that
  keeps deep glow/macow stacks in range at random init."""
  in_channels: int

  @nn.compact
  def __call__(self, x, h=None, reverse: bool = False):
    if self.is_initializing():
      mean = x.mean(axis=(0, 1, 2))
      std = x.std(axis=(0, 1, 2)) + 1e-6
      if reverse:   # out = (x - bias) / exp(log_scale) standardized
        ls0, b0 = jnp.log(std), mean
      else:         # out = x * exp(log_scale) + bias standardized
        ls0, b0 = -jnp.log(std), -mean / std
      ls_init = lambda rng, shape: ls0
      b_init = lambda rng, shape: b0
    else:
      ls_init = nn.initializers.normal(0.05)
      b_init = nn.initializers.zeros
    log_scale = self.param("log_scale", ls_init, (self.in_channels,))
    bias = self.param("bias", b_init, (self.in_channels,))
    hw = x.shape[1] * x.shape[2]
    if not reverse:
      out = x * jnp.exp(log_scale) + bias
      ld = jnp.sum(log_scale) * hw
    else:
      out = (x - bias) / (jnp.exp(log_scale) + 1e-8)
      ld = -jnp.sum(log_scale) * hw
    return out, ld * jnp.ones((x.shape[0],))


class Conv1x1Flow(nn.Module):
  """Invertible 1x1 conv (`flows/permutation.py:14-73`)."""
  in_channels: int

  @nn.compact
  def __call__(self, x, h=None, reverse: bool = False):
    w = self.param("w", nn.initializers.orthogonal(),
                   (self.in_channels, self.in_channels))
    hw = x.shape[1] * x.shape[2]
    if not reverse:
      out = jnp.einsum("bhwc,dc->bhwd", x, w)
      _, ld = jnp.linalg.slogdet(w)
    else:
      w_inv = jnp.linalg.inv(w)
      out = jnp.einsum("bhwc,dc->bhwd", x, w_inv)
      _, ld = jnp.linalg.slogdet(w_inv)
    return out, ld * hw * jnp.ones((x.shape[0],))


# ---------------------------------------------------------------------------
# coupling transforms (`couplings/transform.py`)
# ---------------------------------------------------------------------------


def _affine(params, zp, reverse, alpha):
  mu, log_scale = jnp.split(params, 2, axis=-1)
  scale = jax.nn.sigmoid(log_scale + 2.0) + 1e-3
  if not reverse:
    out = scale * zp + mu
    ld = jnp.sum(jnp.log(scale).reshape(zp.shape[0], -1), axis=-1)
  else:
    out = (zp - mu) / (scale + 1e-12)
    ld = -jnp.sum(jnp.log(scale).reshape(zp.shape[0], -1), axis=-1)
  return out, ld


def _additive(params, zp, reverse, alpha):
  mu = params
  out = zp + mu if not reverse else zp - mu
  return out, jnp.zeros((zp.shape[0],))


def _relu_transform(params, zp, reverse, alpha):
  """`transform.py` ReLU transform: scale = relu-gated affine."""
  mu, log_scale = jnp.split(params, 2, axis=-1)
  scale = jax.nn.sigmoid(log_scale + 2.0)
  if not reverse:
    out = jnp.where(zp >= 0, zp, zp * scale) + mu
    ld_el = jnp.where(zp >= 0, jnp.zeros_like(zp), jnp.log(scale))
  else:
    z = zp - mu
    out = jnp.where(z >= 0, z, z / scale)
    ld_el = -jnp.where(z >= 0, jnp.zeros_like(z), jnp.log(scale))
  return out, jnp.sum(ld_el.reshape(zp.shape[0], -1), axis=-1)


_NLSQ_LOG_A = math.log(8 * math.sqrt(3) / 9 - 0.05)


def _nlsq(params, zp, reverse, alpha):
  """Non-linear squared transform (`transform.py:123-201`):
  y = a + b z + c / (1 + (d z + g)^2), monotone for |c| < A b / d.

  The inverse solves the cubic analytically via the hyperbolic method
  (the reference upcasts to float64 'for stability'; under JAX's default
  x64-disabled mode this runs in f32 — round-trips are good to ~1e-3)."""
  a, logb, cprime, logd, g = jnp.split(params, 5, axis=-1)
  logb = logb * 0.4
  cprime = cprime * 0.3
  logd = logd * 0.4
  c = jnp.exp(_NLSQ_LOG_A + logb - logd) * jnp.tanh(cprime)
  b = jnp.exp(logb)
  d = jnp.exp(logd)

  def bsum(t):
    return jnp.sum(t.reshape(zp.shape[0], -1), axis=-1)

  if not reverse:
    arg = d * zp + g
    denom = arg ** 2 + 1.0
    cd = c / denom
    out = b * zp + a + cd
    ld = bsum(jnp.log(b - 2.0 * cd * d * arg / denom))
    return out, ld

  # cubic in x: -b d^2 x^3 + [(z-a)d^2 - 2bdg] x^2 +
  #             [(z-a)2dg - b(1+g^2)] x + [(z-a)(1+g^2) - c] = 0
  z = zp
  aa = -b * d ** 2
  bb = (z - a) * d ** 2 - 2.0 * b * d * g
  cc = (z - a) * 2.0 * d * g - b * (1.0 + g ** 2)
  dd = (z - a) * (1.0 + g ** 2) - c

  p = (3.0 * aa * cc - bb ** 2) / (3.0 * aa ** 2)
  q = (2.0 * bb ** 3 - 9.0 * aa * bb * cc + 27.0 * aa ** 2 * dd) \
      / (27.0 * aa ** 3)
  absp = jnp.abs(p) + 1e-12
  t_neg = (-2.0 * jnp.sign(q) * jnp.sqrt(absp / 3.0)
           * jnp.cosh(jnp.arccosh(
               jnp.abs(-3.0 * jnp.abs(q) / (2.0 * p)
                       * jnp.sqrt(3.0 / absp) - 1.0) + 1.0) / 3.0))
  t_pos = (-2.0 * jnp.sqrt(absp / 3.0)
           * jnp.sinh(jnp.arcsinh(
               3.0 * q / (2.0 * p) * jnp.sqrt(3.0 / absp)) / 3.0))
  t = jnp.where(p > 0, t_pos, t_neg)
  x = t - bb / (3.0 * aa)
  arg = d * x + g
  denom = arg ** 2 + 1.0
  ld = -bsum(jnp.log(b - 2.0 * c / denom * d * arg / denom))
  return x, ld


def _symm_elu(params, zp, reverse, alpha):
  """Symmetric-ELU shift (`transform.py:204-234`):
  y = z - sign(z)*s*(e^{-|z|}-1) + mu, s = tanh(log_scale/2)."""
  mu, log_scale = jnp.split(params, 2, axis=-1)
  scale = jnp.tanh(log_scale * 0.5)

  def bsum(t):
    return jnp.sum(t.reshape(zp.shape[0], -1), axis=-1)

  if not reverse:
    tmp = jnp.exp(-jnp.abs(zp))
    out = zp - jnp.sign(zp) * scale * (tmp - 1.0) + mu
    return out, bsum(jnp.log(scale * tmp + 1.0))
  # the reference's backward applies the mirrored form (approximate
  # inverse; exact for scale -> 0) and reports no log-det
  out = -jnp.sign(zp) * scale * (jnp.exp(-jnp.abs(zp)) - 1.0) + mu
  return out, jnp.zeros((zp.shape[0],))


_TRANSFORMS = {
    "affine": (_affine, 2),
    "additive": (_additive, 1),
    "relu": (_relu_transform, 2),
    "nlsq": (_nlsq, 5),
    "symm_elu": (_symm_elu, 2),
}


class NICE2d(nn.Module):
  """2-D NICE coupling on a channel split (`coupling.py:179-360`)."""
  in_channels: int
  hidden_channels: Optional[int] = None
  h_channels: int = 0
  split_type: str = "continuous"
  order: str = "up"
  factor: int = 2
  transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[int] = None

  def setup(self):
    split_type = self.split_type
    if split_type == "skip":
      assert self.factor == 2
      if self.in_channels % 2 == 1:
        split_type = "continuous"
    self._split_type = split_type
    out_channels = self.in_channels // self.factor
    in_ch = self.in_channels - out_channels
    self.z1_channels = in_ch if self.order == "up" else out_channels
    fn, mult = _TRANSFORMS[self.transform]
    self._tfn = fn
    hidden = self.hidden_channels or min(8 * self.in_channels, 512)
    self.net = NICEConvBlock(out_channels * mult, hidden,
                             activation=self.activation,
                             normalize=self.normalize,
                             num_groups=self.num_groups)
    if self.h_type is None:
      self.h_net = None
    elif self.h_type == "local_linear":
      self.h_net = LocalLinearCondNet(hidden)
    elif self.h_type == "global_linear":
      self.h_net = GlobalLinearCondNet(hidden)
    else:
      raise NotImplementedError(f"h_type {self.h_type}")

  def _split(self, z):
    if self._split_type == "continuous":
      return z[..., :self.z1_channels], z[..., self.z1_channels:]
    return z[..., 0::2], z[..., 1::2]

  def _unsplit(self, z1, z2):
    if self._split_type == "continuous":
      return jnp.concatenate([z1, z2], axis=-1)
    out = jnp.stack([z1, z2], axis=-1)
    return out.reshape(*z1.shape[:-1], z1.shape[-1] * 2)

  def __call__(self, z, h=None, reverse: bool = False, train: bool = True):
    z1, z2 = self._split(z)
    zc, zp = (z1, z2) if self.order == "up" else (z2, z1)
    hc = self.h_net(h, x=zc) if self.h_net is not None else None
    params = self.net(zc, h=hc, train=train)
    zp, ld = self._tfn(params, zp, reverse, self.alpha)
    z1, z2 = (zc, zp) if self.order == "up" else (zp, zc)
    return self._unsplit(z1, z2), ld


# ---------------------------------------------------------------------------
# Glow
# ---------------------------------------------------------------------------


class GlowUnit(nn.Module):
  """coupling(cont up/down) -> actnorm -> coupling(skip up/down)
  (`glow.py:14-117`)."""
  in_channels: int
  hidden_channels: int = 512
  h_channels: int = 0
  transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[int] = None

  def setup(self):
    kw = dict(in_channels=self.in_channels,
              hidden_channels=self.hidden_channels,
              h_channels=self.h_channels, transform=self.transform,
              alpha=self.alpha, h_type=self.h_type,
              activation=self.activation, normalize=self.normalize,
              num_groups=self.num_groups)
    self.coupling1_up = NICE2d(split_type="continuous", order="up", **kw)
    self.coupling1_dn = NICE2d(split_type="continuous", order="down", **kw)
    self.actnorm = ActNorm2dFlow(self.in_channels)
    self.coupling2_up = NICE2d(split_type="skip", order="up", **kw)
    self.coupling2_dn = NICE2d(split_type="skip", order="down", **kw)

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    if not reverse:
      mods = [self.coupling1_up, self.coupling1_dn, self.actnorm,
              self.coupling2_up, self.coupling2_dn]
    else:
      mods = [self.coupling2_dn, self.coupling2_up, self.actnorm,
              self.coupling1_dn, self.coupling1_up]
    ld_total = jnp.zeros((x.shape[0],))
    for m in mods:
      if isinstance(m, ActNorm2dFlow):
        x, ld = m(x, reverse=reverse)
      else:
        x, ld = m(x, h=h, reverse=reverse, train=train)
      ld_total = ld_total + ld
    return x, ld_total


class GlowStep(nn.Module):
  """actnorm -> 1x1 conv -> glow unit (`glow.py:119-166`)."""
  in_channels: int
  hidden_channels: int = 512
  h_channels: int = 0
  transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[int] = None

  def setup(self):
    self.actnorm = ActNorm2dFlow(self.in_channels)
    self.conv1x1 = Conv1x1Flow(self.in_channels)
    self.unit = GlowUnit(self.in_channels, self.hidden_channels,
                         self.h_channels, self.transform, self.alpha,
                         self.h_type, self.activation, self.normalize,
                         self.num_groups)

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    ld_total = jnp.zeros((x.shape[0],))
    if not reverse:
      x, ld = self.actnorm(x)
      ld_total += ld
      x, ld = self.conv1x1(x)
      ld_total += ld
      x, ld = self.unit(x, h=h, train=train)
      ld_total += ld
    else:
      x, ld = self.unit(x, h=h, reverse=True, train=train)
      ld_total += ld
      x, ld = self.conv1x1(x, reverse=True)
      ld_total += ld
      x, ld = self.actnorm(x, reverse=True)
      ld_total += ld
    return x, ld_total


class MultiScalePrior(nn.Module):
  """conv1x1 -> coupling -> actnorm on z2 (`multiscale_architecture.py:13-73`)."""
  in_channels: int
  hidden_channels: int
  h_channels: int
  factor: int
  transform: str
  alpha: float
  h_type: Optional[str]
  activation: str
  normalize: Optional[str]
  num_groups: Optional[int]

  def setup(self):
    self.conv1x1 = Conv1x1Flow(self.in_channels)
    self.coupling = NICE2d(in_channels=self.in_channels,
                           hidden_channels=self.hidden_channels,
                           h_channels=self.h_channels,
                           transform=self.transform, alpha=self.alpha,
                           factor=self.factor, h_type=self.h_type,
                           split_type="continuous", order="up",
                           activation=self.activation,
                           normalize=self.normalize,
                           num_groups=self.num_groups)
    out_channels = self.in_channels // self.factor
    self.z1_channels = self.in_channels - out_channels
    self.actnorm = ActNorm2dFlow(out_channels)

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    ld_total = jnp.zeros((x.shape[0],))
    if not reverse:
      x, ld = self.conv1x1(x)
      ld_total += ld
      x, ld = self.coupling(x, h=h, train=train)
      ld_total += ld
      x1, x2 = split2d(x, self.z1_channels)
      x2, ld = self.actnorm(x2)
      ld_total += ld
      x = unsplit2d([x1, x2])
    else:
      x1, x2 = split2d(x, self.z1_channels)
      x2, ld = self.actnorm(x2, reverse=True)
      ld_total += ld
      x = unsplit2d([x1, x2])
      x, ld = self.coupling(x, h=h, reverse=True, train=train)
      ld_total += ld
      x, ld = self.conv1x1(x, reverse=True)
      ld_total += ld
    return x, ld_total


@register_flow("glow")
class Glow(nn.Module):
  """Glow over the wolf multi-scale architecture
  (`glow.py:168-187`, `multiscale_architecture.py:231-372`)."""
  levels: int
  num_steps: Sequence[int]
  in_channels: int
  factors: Sequence[int]
  hidden_channels: Sequence[int]
  h_channels: int = 0
  transform: str = "affine"
  prior_transform: str = "affine"
  alpha: float = 1.0
  h_type: Optional[str] = None
  activation: str = "relu"
  normalize: Optional[str] = None
  num_groups: Optional[Sequence[int]] = None

  def setup(self):
    assert self.levels > 1 and self.levels == len(self.num_steps)
    factors = [0] + list(self.factors) + [0]
    assert self.levels == len(factors)
    blocks = []
    meta = []  # (kind, z_channels)
    in_ch = self.in_channels
    h_ch = self.h_channels
    squeeze_h = self.h_type is not None and self.h_type.startswith("local")
    self._squeeze_h = squeeze_h
    for level in range(self.levels):
      hidden = self.hidden_channels[level]
      ng = (self.num_groups[level] if self.normalize == "group_norm"
            else None)
      common = dict(hidden_channels=hidden, h_channels=h_ch,
                    transform=self.transform, alpha=self.alpha,
                    h_type=self.h_type, activation=self.activation,
                    normalize=self.normalize, num_groups=ng)
      if level == 0:
        steps = [GlowStep(in_channels=in_ch, **common)
                 for _ in range(self.num_steps[level])]
        blocks.append(steps)
        meta.append(("external", None))
      elif level == self.levels - 1:
        in_ch *= 4
        if squeeze_h:
          h_ch *= 4
        steps = [GlowStep(in_channels=in_ch, **common)
                 for _ in range(self.num_steps[level])]
        blocks.append(steps)
        meta.append(("external", None))
      else:
        in_ch *= 4
        if squeeze_h:
          h_ch *= 4
        factor = factors[level]
        layers, priors = [], []
        channel_step = in_ch // factor
        cc, ff = in_ch, factor
        z1 = None
        for ns in self.num_steps[level]:
          layers.append([GlowStep(in_channels=cc, **common)
                         for _ in range(ns)])
          priors.append(MultiScalePrior(
              in_channels=cc, hidden_channels=hidden, h_channels=h_ch,
              factor=ff, transform=self.prior_transform, alpha=self.alpha,
              h_type=self.h_type, activation=self.activation,
              normalize=self.normalize, num_groups=ng))
          cc = cc - channel_step
          ff -= 1
        blocks.append((layers, priors))
        meta.append(("internal", cc))
        in_ch = cc
    self.blocks_ = blocks
    self._meta = meta

  def _run_block(self, i, x, h, reverse, train):
    kind, _ = self._meta[i]
    ld_total = jnp.zeros((x.shape[0],))
    if kind == "external":
      steps = self.blocks_[i]
      for step in (steps if not reverse else reversed(steps)):
        x, ld = step(x, h=h, reverse=reverse, train=train)
        ld_total += ld
      return x, ld_total
    layers, priors = self.blocks_[i]
    if not reverse:
      outputs = []
      for layer, prior in zip(layers, priors):
        for step in layer:
          x, ld = step(x, h=h, train=train)
          ld_total += ld
        x, ld = prior(x, h=h, train=train)
        ld_total += ld
        x, x2 = split2d(x, prior.z1_channels)
        outputs.append(x2)
      outputs.append(x)
      outputs.reverse()
      return unsplit2d(outputs), ld_total
    # reverse
    outputs = []
    for prior in priors:
      x, x2 = split2d(x, prior.z1_channels)
      outputs.append(x2)
    for layer, prior in zip(reversed(layers), reversed(priors)):
      x2 = outputs.pop()
      x = unsplit2d([x, x2])
      x, ld = prior(x, h=h, reverse=True, train=train)
      ld_total += ld
      for step in reversed(layer):
        x, ld = step(x, h=h, reverse=True, train=train)
        ld_total += ld
    return x, ld_total

  def __call__(self, x, h=None, reverse: bool = False, train: bool = True):
    ld_total = jnp.zeros((x.shape[0],))
    if not reverse:
      outputs = []
      for i in range(self.levels):
        x, ld = self._run_block(i, x, h, False, train)
        ld_total += ld
        if i < self.levels - 1:
          if i > 0:
            x, x2 = split2d(x, self._meta[i][1])
            outputs.append(x2)
          x = squeeze2d(x, 2)
          if self._squeeze_h and h is not None:
            h = squeeze2d(h, 2)
      x = unsqueeze2d(x, 2)
      for _ in range(self.levels - 2):
        x2 = outputs.pop()
        x = unsqueeze2d(unsplit2d([x, x2]), 2)
      assert not outputs
      return x, ld_total
    # reverse
    outputs = []
    hs = [h]
    for i in range(self.levels - 1):
      if i > 0:
        x, x2 = split2d(x, self._meta[i][1])
        outputs.append(x2)
      x = squeeze2d(x, 2)
      if self._squeeze_h and h is not None:
        h = squeeze2d(h, 2)
      hs.append(h)
    for j, i in enumerate(reversed(range(self.levels))):
      if j > 0:
        x = unsqueeze2d(x, 2)
        h = hs[i]
        if j < self.levels - 1:
          x2 = outputs.pop()
          x = unsplit2d([x, x2])
      x, ld = self._run_block(i, x, h, True, train)
      ld_total += ld
    assert not outputs
    return x, ld_total

  @classmethod
  def from_params(cls, params: Dict) -> "Glow":
    return Glow(**params)
