"""Wolf VAE-flow: Gaussian variational encoder + flow prior + conditional
residual-flow generator (flax.linen for the stateful encoder/prior, the
functional `indm_tpu.flows.resflow` for the generator).

Re-design of `/root/reference/flow_models/wolf/` (SURVEY.md §2.5): the INDM
default `resflow-gaussian-uni` preset = resflow generator + global ResNet-BN
encoder -> weight-norm FC -> (mu, logvar) Gaussian posterior + 2-step NICE
flow prior + (disabled) uniform dequantizer (`wolf.py:137-140`).

BatchNorm running statistics live in the flax 'batch_stats' collection and
are threaded through the joint train step explicitly (the functional
equivalent of torch's implicit buffer mutation).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.flows.resflow import ResidualFlow

_ACTS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1),
}


# ---------------------------------------------------------------------------
# nnet building blocks (`flow_models/wolf/nnet/`)
# ---------------------------------------------------------------------------


class DenseWeightNorm(nn.Module):
  """Dense with weight normalization w = g * v/||v||
  (`nnet/weight_norm.py:8-41`; v ~ N(0, 0.05), g initialized to ||v||)."""
  features: int

  @nn.compact
  def __call__(self, x):
    in_dim = x.shape[-1]
    v = self.param("v", nn.initializers.normal(0.05), (in_dim, self.features))
    # torch weight_norm initializes g = ||v|| so the initial weight equals v.
    g = self.param("g", lambda rng: jnp.linalg.norm(
        nn.initializers.normal(0.05)(rng, (in_dim, self.features)), axis=0))
    b = self.param("b", nn.initializers.zeros, (self.features,))
    w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))
    return x @ w + b


class ResNetBlockBN(nn.Module):
  """Strided ResNet block with BatchNorm
  (`nnet/resnets/resnet_batchnorm.py:18-78`), NHWC."""
  planes: int
  stride: int = 1
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    act = _ACTS[self.activation]
    inp = x.shape[-1]
    residual = x
    # torch conv3x3 (`nnet/resnets/resnet_batchnorm.py:7-9`) pads 1 on both
    # sides at ANY stride; flax "SAME" would pad (0, 1) at stride 2.
    h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                padding=((1, 1), (1, 1)), use_bias=False)(x)
    h = nn.BatchNorm(use_running_average=not train)(h)
    h = act(h)
    h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False)(h)
    h = nn.BatchNorm(use_running_average=not train)(h)
    if self.stride != 1 or inp != self.planes:
      residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                         use_bias=False)(x)
      residual = nn.BatchNorm(use_running_average=not train)(residual)
    return act(h + residual)


class ResNetBlockGN(nn.Module):
  """GroupNorm variant (`nnet/resnets/resnet_groupnorm.py:9-68`), NHWC."""
  planes: int
  num_groups: int
  stride: int = 1
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    act = _ACTS[self.activation]
    inp = x.shape[-1]
    residual = x
    # torch conv3x3 (`nnet/resnets/resnet_batchnorm.py:7-9`) pads 1 on both
    # sides at ANY stride; flax "SAME" would pad (0, 1) at stride 2.
    h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                padding=((1, 1), (1, 1)), use_bias=False)(x)
    h = nn.GroupNorm(num_groups=self.num_groups)(h)
    h = act(h)
    h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False)(h)
    h = nn.GroupNorm(num_groups=self.num_groups)(h)
    if self.stride != 1 or inp != self.planes:
      residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                         use_bias=False)(x)
      residual = nn.GroupNorm(num_groups=self.num_groups)(residual)
    return act(h + residual)


class DeResNetBlockBN(nn.Module):
  """Transposed-conv ResNet block with BatchNorm
  (`nnet/resnets/resnet_batchnorm.py` DeResNetBlockBatchNorm), NHWC.
  torch deconv3x3(stride, output_padding) == lax conv_transpose; flax
  ConvTranspose with SAME padding reproduces stride*h output, which matches
  the reference's stride-2/output_padding-1 configuration."""
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
  """GroupNorm variant (`resnet_groupnorm.py:71-131`), NHWC."""
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


class GlobalResNetEncoderBN(nn.Module):
  """Strided ResNet pyramid -> flatten
  (`modules/encoders/global_encoder.py:12-44`). Each level = 2 blocks with
  strides [1, 2]."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    assert len(self.hidden_planes) == self.levels
    for level in range(self.levels):
      hc = self.hidden_planes[level]
      x = ResNetBlockBN(hc, stride=1, activation=self.activation)(x, train)
      x = ResNetBlockBN(hc, stride=2, activation=self.activation)(x, train)
    x = nn.Conv(self.out_planes, (1, 1), use_bias=True)(x)
    x = jax.nn.elu(x)
    return x.reshape(x.shape[0], -1)


class GlobalResNetEncoderGN(nn.Module):
  """GroupNorm global encoder
  (`modules/encoders/global_encoder.py:47-85`)."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  num_groups: Sequence[int]
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    assert len(self.hidden_planes) == self.levels
    assert len(self.num_groups) == self.levels
    for level in range(self.levels):
      hc = self.hidden_planes[level]
      ng = self.num_groups[level]
      x = ResNetBlockGN(hc, num_groups=ng, stride=1,
                        activation=self.activation)(x, train)
      x = ResNetBlockGN(hc, num_groups=ng, stride=2,
                        activation=self.activation)(x, train)
    x = nn.Conv(self.out_planes, (1, 1), use_bias=True)(x)
    x = jax.nn.elu(x)
    return x.reshape(x.shape[0], -1)


class LocalResNetEncoderBN(nn.Module):
  """Local (spatial-output) encoder: strided ResNet pyramid followed by a
  mirrored transposed-conv pyramid back to input resolution
  (`modules/encoders/local_encoder.py:12-53`). Returns [B, H, W,
  out_planes] feature maps for local conditioning."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    assert len(self.hidden_planes) == self.levels
    for level in range(self.levels):
      hc = self.hidden_planes[level]
      x = ResNetBlockBN(hc, stride=1, activation=self.activation)(x, train)
      x = ResNetBlockBN(hc, stride=2, activation=self.activation)(x, train)
    down = [self.out_planes] + list(self.hidden_planes)
    for level in reversed(range(self.levels)):
      inp = x.shape[-1]
      x = DeResNetBlockBN(inp, stride=1,
                          activation=self.activation)(x, train)
      x = DeResNetBlockBN(down[level], stride=2,
                          activation=self.activation)(x, train)
    return x


class LocalResNetEncoderGN(nn.Module):
  """GroupNorm local encoder (`local_encoder.py:56-105`)."""
  levels: int
  hidden_planes: Sequence[int]
  out_planes: int
  num_groups: Sequence[int]
  activation: str = "elu"

  @nn.compact
  def __call__(self, x, train: bool = True):
    assert len(self.hidden_planes) == self.levels
    assert len(self.num_groups) == self.levels
    for level in range(self.levels):
      hc = self.hidden_planes[level]
      ng = self.num_groups[level]
      x = ResNetBlockGN(hc, num_groups=ng, stride=1,
                        activation=self.activation)(x, train)
      x = ResNetBlockGN(hc, num_groups=ng, stride=2,
                        activation=self.activation)(x, train)
    down = [self.out_planes] + list(self.hidden_planes)
    for level in reversed(range(self.levels)):
      ng = self.num_groups[level]
      inp = x.shape[-1]
      x = DeResNetBlockGN(inp, num_groups=ng, stride=1,
                          activation=self.activation)(x, train)
      x = DeResNetBlockGN(down[level], num_groups=ng, stride=2,
                          activation=self.activation)(x, train)
    return x


# ---------------------------------------------------------------------------
# Prior flow (`modules/discriminators/priors/flow.py` + NICE couplings)
# ---------------------------------------------------------------------------


def _affine_params(raw, alpha=1.0):
  """`flows/couplings/transform.py:49-61`: scale = sigmoid(ls + 2) + 1e-3."""
  mu, log_scale = jnp.split(raw, 2, axis=-1)
  scale = jax.nn.sigmoid(log_scale + 2.0) + 1e-3
  return mu, scale


class NICEMLPBlock(nn.Module):
  """`flows/couplings/blocks.py:11-48`."""
  out_features: int
  hidden_features: int
  activation: str = "elu"

  @nn.compact
  def __call__(self, x):
    act = _ACTS[self.activation]
    h = act(nn.Dense(self.hidden_features,
                     bias_init=nn.initializers.zeros)(x))
    h = act(nn.Dense(self.hidden_features,
                     bias_init=nn.initializers.zeros)(h))
    return DenseWeightNorm(self.out_features)(h)


class NICE1d(nn.Module):
  """1-D NICE coupling with continuous/skip splits and affine transform
  (`flows/couplings/coupling.py:13-133`)."""
  in_features: int
  hidden_features: int
  split_type: str = "continuous"   # 'continuous' | 'skip'
  order: str = "up"                # 'up' | 'down'
  activation: str = "elu"
  alpha: float = 1.0

  def setup(self):
    half = self.in_features // 2
    self.net = NICEMLPBlock(out_features=half * 2,
                            hidden_features=self.hidden_features,
                            activation=self.activation)

  def _split(self, z):
    half = self.in_features // 2
    if self.split_type == "continuous":
      return z[..., :half], z[..., half:]
    return z[..., 0::2], z[..., 1::2]

  def _unsplit(self, z1, z2):
    if self.split_type == "continuous":
      return jnp.concatenate([z1, z2], axis=-1)
    out = jnp.stack([z1, z2], axis=-1)
    return out.reshape(*z1.shape[:-1], z1.shape[-1] * 2)

  def _transform(self, z, zp, reverse):
    raw = self.net(z)
    mu, scale = _affine_params(raw, self.alpha)
    if not reverse:
      zp = scale * zp + mu
      logdet = jnp.sum(jnp.log(scale), axis=-1)
    else:
      zp = (zp - mu) / (scale + 1e-12)
      logdet = -jnp.sum(jnp.log(scale), axis=-1)
    return zp, logdet

  def __call__(self, z, reverse: bool = False):
    z1, z2 = self._split(z)
    zc, zp = (z1, z2) if self.order == "up" else (z2, z1)
    zp, logdet = self._transform(zc, zp, reverse)
    z1, z2 = (zc, zp) if self.order == "up" else (zp, zc)
    return self._unsplit(z1, z2), logdet


class ActNorm1dFlow(nn.Module):
  """`flows/normalization.py:13-74`."""
  in_features: int

  @nn.compact
  def __call__(self, x, reverse: bool = False):
    log_scale = self.param("log_scale", nn.initializers.normal(0.05),
                           (self.in_features,))
    bias = self.param("bias", nn.initializers.zeros, (self.in_features,))
    if not reverse:
      out = x * jnp.exp(log_scale) + bias
      logdet = jnp.sum(log_scale) * jnp.ones((x.shape[0],))
    else:
      out = (x - bias) / (jnp.exp(log_scale) + 1e-8)
      logdet = -jnp.sum(log_scale) * jnp.ones((x.shape[0],))
    return out, logdet


class InvertibleLinearFlow(nn.Module):
  """`flows/permutation.py:75-140`. The torch version caches weight_inv and
  computes slogdet on CPU; here the 64x64 inverse/slogdet run on device."""
  in_features: int

  @nn.compact
  def __call__(self, x, reverse: bool = False):
    w = self.param("w", nn.initializers.orthogonal(), (self.in_features,
                                                       self.in_features))
    if not reverse:
      out = x @ w.T
      _, ld = jnp.linalg.slogdet(w)
    else:
      w_inv = jnp.linalg.inv(w)
      out = x @ w_inv.T
      _, ld = jnp.linalg.slogdet(w_inv)
    return out, ld * jnp.ones((x.shape[0],))


class PriorFlowUnit(nn.Module):
  """4 couplings + actnorm (`priors/flow.py:16-110`)."""
  in_features: int
  hidden_features: int
  activation: str = "elu"

  def setup(self):
    kw = dict(in_features=self.in_features,
              hidden_features=self.hidden_features,
              activation=self.activation)
    self.coupling1_up = NICE1d(split_type="continuous", order="up", **kw)
    self.coupling1_dn = NICE1d(split_type="continuous", order="down", **kw)
    self.actnorm = ActNorm1dFlow(self.in_features)
    self.coupling2_up = NICE1d(split_type="skip", order="up", **kw)
    self.coupling2_dn = NICE1d(split_type="skip", order="down", **kw)

  def __call__(self, x, reverse: bool = False):
    if not reverse:
      mods = [self.coupling1_up, self.coupling1_dn, self.actnorm,
              self.coupling2_up, self.coupling2_dn]
    else:
      mods = [self.coupling2_dn, self.coupling2_up, self.actnorm,
              self.coupling1_dn, self.coupling1_up]
    logdet = jnp.zeros((x.shape[0],))
    for m in mods:
      x, ld = m(x, reverse=reverse)
      logdet = logdet + ld
    return x, logdet


class PriorFlowStep(nn.Module):
  """actnorm -> invertible linear -> unit (`priors/flow.py:113-157`)."""
  in_features: int
  hidden_features: int
  activation: str = "elu"

  def setup(self):
    self.actnorm = ActNorm1dFlow(self.in_features)
    self.linear = InvertibleLinearFlow(self.in_features)
    self.unit = PriorFlowUnit(self.in_features, self.hidden_features,
                              self.activation)

  def __call__(self, x, reverse: bool = False):
    mods = ([self.actnorm, self.linear, self.unit] if not reverse
            else [self.unit, self.linear, self.actnorm])
    logdet = jnp.zeros((x.shape[0],))
    for m in mods:
      x, ld = m(x, reverse=reverse)
      logdet = logdet + ld
    return x, logdet


class PriorFlow(nn.Module):
  """Built with inverse=True in the reference (`priors/flow.py:163-167`):
  the DENSITY pass (z -> epsilon, used by calcKL via `bwdpass`) is the
  forward chain; SAMPLING (epsilon -> z, via `fwdpass`) is the backward
  chain."""
  num_steps: int
  in_features: int
  hidden_features: int
  activation: str = "elu"

  def setup(self):
    self.steps = [PriorFlowStep(self.in_features, self.hidden_features,
                                self.activation)
                  for _ in range(self.num_steps)]

  def density(self, z):
    logdet = jnp.zeros((z.shape[0],))
    out = z
    for step in self.steps:
      out, ld = step(out, reverse=False)
      logdet = logdet + ld
    return out, logdet

  def sample_pass(self, epsilon):
    logdet = jnp.zeros((epsilon.shape[0],))
    out = epsilon
    for step in reversed(self.steps):
      out, ld = step(out, reverse=True)
      logdet = logdet + ld
    return out, logdet


class GaussianDiscriminator(nn.Module):
  """Gaussian variational 'discriminator' (global encoder)
  (`modules/discriminators/gaussian.py:14-100`) with a flow or normal
  prior (`priors/prior.py:47-81`, `priors/flow.py`)."""
  encoder_levels: int
  encoder_hidden: Sequence[int]
  encoder_out_planes: int
  encoder_activation: str
  in_dim: int
  dim: int
  prior_type: str = "flow"            # 'flow' | 'normal'
  prior_steps: int = 0
  prior_hidden: int = 0
  prior_activation: str = "elu"
  encoder_type: str = "global_resnet_bn"  # | 'global_resnet_gn'
  encoder_groups: Optional[Sequence[int]] = None

  def setup(self):
    if self.encoder_type == "global_resnet_bn":
      self.encoder = GlobalResNetEncoderBN(
          levels=self.encoder_levels, hidden_planes=self.encoder_hidden,
          out_planes=self.encoder_out_planes,
          activation=self.encoder_activation)
    elif self.encoder_type == "global_resnet_gn":
      self.encoder = GlobalResNetEncoderGN(
          levels=self.encoder_levels, hidden_planes=self.encoder_hidden,
          out_planes=self.encoder_out_planes,
          num_groups=tuple(self.encoder_groups),
          activation=self.encoder_activation)
    else:
      # local encoders keep spatial structure; the Gaussian global (mu,
      # logvar) FC head is only defined over flattened global features
      # (`gaussian.py:19,23-25`)
      raise NotImplementedError(
          f"GaussianDiscriminator supports global encoders only, got "
          f"{self.encoder_type!r} (local encoders are standalone modules: "
          "LocalResNetEncoderBN/GN)")
    self.fc = DenseWeightNorm(2 * self.dim)
    if self.prior_type == "flow":
      self.prior = PriorFlow(num_steps=self.prior_steps,
                             in_features=self.dim,
                             hidden_features=self.prior_hidden,
                             activation=self.prior_activation)
    elif self.prior_type != "normal":
      raise NotImplementedError(f"prior type {self.prior_type!r}")

  def __call__(self, x, train: bool = True):
    c = self.encoder(x, train=train)
    c = self.fc(c)
    mu, logvar = jnp.split(c, 2, axis=-1)
    return mu, logvar

  def sampling_and_KL(self, x, y=None, train: bool = True,
                      nsamples: int = 1):
    """(`gaussian.py:67-76`). Returns (z [B*ns, dim], KL [B])."""
    mu, logvar = self(x, train=train)
    b = mu.shape[0]
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(self.make_rng("sample"),
                            (b, nsamples, self.dim))
    z = eps * std[:, None, :] + mu[:, None, :]
    kl = self.calc_kl(z, eps, mu, logvar)
    return z.reshape(b * nsamples, self.dim), kl

  def calc_kl(self, z, eps, mu, logvar):
    """FlowPrior.calcKL (`priors/flow.py:233-253`) or the closed Gaussian
    form for the normal prior (`priors/prior.py:69-71`)."""
    if self.prior_type == "normal":
      return 0.5 * jnp.sum(mu ** 2 + jnp.exp(logvar) - logvar - 1.0,
                           axis=1)
    dim = z.shape[2]
    nsamples = z.shape[1]
    cc = math.log(math.pi * 2.0)
    log_posterior = jnp.sum(logvar[:, None, :] + eps ** 2, axis=2) + cc * dim
    log_posterior = jnp.mean(log_posterior, axis=1) * -0.5

    zf = z.reshape(-1, dim)
    epsilon, logdet = self.prior.density(zf)
    epsilon = epsilon.reshape(epsilon.shape[0], -1)
    log_prior = jnp.sum(epsilon ** 2, axis=1) + cc * epsilon.shape[1]
    # [B*ns] -> [B]: mean over posterior samples (ns=1 in INDM)
    log_prior = (log_prior * -0.5 + logdet).reshape(
        z.shape[0], nsamples).sum(axis=1) / nsamples
    return log_posterior - log_prior

  def sample_from_prior(self, nsamples: int):
    epsilon = jax.random.normal(self.make_rng("sample"),
                                (nsamples, self.dim))
    if self.prior_type == "normal":
      return epsilon
    z, _ = self.prior.sample_pass(epsilon)
    return z


def make_discriminator(wolf_params: Dict):
  """Discriminator dispatch over the full preset matrix
  (`wolf.py:132-145`, the Discriminator registry
  `modules/discriminators/discriminator.py:86-95`):
    * 'gaussian' -> GaussianDiscriminator (global BN/GN encoder, flow or
      normal prior; `gaussian.py:94-100`);
    * 'categorical' -> CategoricalDiscriminator
      (`discriminators/categorical.py`);
    * 'base' -> BaseDiscriminator (z=None, KL=0;
      `discriminator.py:8-95`)."""
  from indm_tpu.flows import wolf_extras

  d = wolf_params["discriminator"]
  kind = d["type"]
  if kind == "base":
    return wolf_extras.BaseDiscriminator()
  if kind == "categorical":
    return wolf_extras.CategoricalDiscriminator(
        num_events=d["num_events"], dim=d["dim"],
        activation=d.get("activation", "relu"),
        probs=d.get("probs"), logits=d.get("logits"))
  assert kind == "gaussian", f"unknown discriminator type {kind!r}"
  enc = d["encoder"]
  assert enc["type"] in ("global_resnet_bn", "global_resnet_gn"), enc["type"]
  prior = d["prior"]
  assert prior["type"] in ("flow", "normal"), prior["type"]
  return GaussianDiscriminator(
      encoder_levels=enc["levels"],
      encoder_hidden=tuple(enc["hidden_planes"]),
      encoder_out_planes=enc["out_planes"],
      encoder_activation=enc["activation"],
      encoder_type=enc["type"],
      encoder_groups=tuple(enc.get("num_groups", ())) or None,
      in_dim=d["in_dim"],
      dim=d["dim"],
      prior_type=prior["type"],
      prior_steps=prior.get("num_steps", 0),
      prior_hidden=prior.get("hidden_features", 0),
      prior_activation=prior.get("activation", "elu"),
  )
