"""NCSNv2 RefineNet score networks (flax, NHWC).

Port of `/root/reference/models/ncsnv2.py:31-415` and the RefineNet layer
zoo (`models/layers.py:133-507`): CRP/RCU/MSF/RefineBlock, dilated residual
blocks with ConvMeanPool downsampling, InstanceNorm++ normalization, output
scaled by 1/sigma. Registered: 'ncsnv2_64', 'ncsn' (conditional),
'ncsnv2_128', 'ncsnv2_256'; `get_network` dispatches by image size
(`ncsnv2.py:31-41`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from indm_tpu.models import normalization as norm_lib
from indm_tpu.models.layers import get_act
from indm_tpu.models.registry import get_sigmas, register_model


def ncsn_conv(features, kernel=3, stride=1, bias=True, dilation=1,
              init_scale=1.0):
  """NCSN conv: default torch init scaled by init_scale
  (`models/layers.py:108-115`)."""
  init_scale = 1e-10 if init_scale == 0 else init_scale
  k_init = nn.initializers.variance_scaling(init_scale / 3.0, "fan_in",
                                            "uniform")
  return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                 kernel_dilation=(dilation, dilation), padding="SAME",
                 use_bias=bias, kernel_init=k_init)


class ConvMeanPool(nn.Module):
  """conv then 2x2 mean pool (`models/layers.py:351-369`)."""
  features: int
  kernel: int = 3
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x):
    if self.adjust_padding:
      x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    out = ncsn_conv(self.features, self.kernel)(x)
    return (out[:, ::2, ::2] + out[:, 1::2, ::2] + out[:, ::2, 1::2]
            + out[:, 1::2, 1::2]) / 4.0


class CRPBlock(nn.Module):
  """Chained residual pooling (`models/layers.py:133-154`)."""
  features: int
  n_stages: int
  act: Callable
  maxpool: bool = True

  @nn.compact
  def __call__(self, x):
    x = self.act(x)
    path = x
    for _ in range(self.n_stages):
      if self.maxpool:
        path = nn.max_pool(path, (5, 5), strides=(1, 1),
                           padding=((2, 2), (2, 2)))
      else:
        path = nn.avg_pool(path, (5, 5), strides=(1, 1),
                           padding=((2, 2), (2, 2)))
      path = ncsn_conv(self.features, bias=False)(path)
      x = path + x
    return x


class RCUBlock(nn.Module):
  """Residual conv units (`models/layers.py:183-204`)."""
  features: int
  n_blocks: int
  n_stages: int
  act: Callable

  @nn.compact
  def __call__(self, x):
    for _ in range(self.n_blocks):
      residual = x
      for _ in range(self.n_stages):
        x = self.act(x)
        x = ncsn_conv(self.features, bias=False)(x)
      x = x + residual
    return x


class MSFBlock(nn.Module):
  """Multi-scale fusion: conv + bilinear resize + sum
  (`models/layers.py:234-250`)."""
  features: int

  @nn.compact
  def __call__(self, xs, shape):
    total = 0.0
    for x in xs:
      h = ncsn_conv(self.features)(x)
      h = jax.image.resize(h, (h.shape[0], shape[0], shape[1], h.shape[-1]),
                           "bilinear")
      total = total + h
    return total


class RefineBlock(nn.Module):
  """`models/layers.py:277-310`."""
  features: int
  act: Callable
  start: bool = False
  end: bool = False
  maxpool: bool = True

  @nn.compact
  def __call__(self, xs, output_shape):
    hs = [RCUBlock(x.shape[-1], 2, 2, self.act)(x) for x in xs]
    if len(xs) > 1:
      h = MSFBlock(self.features)(hs, output_shape)
    else:
      h = hs[0]
    h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool)(h)
    return RCUBlock(self.features, 3 if self.end else 1, 2, self.act)(h)


class ResidualBlockV2(nn.Module):
  """Pre-activation residual block with optional dilated convs or
  ConvMeanPool downsampling (`models/layers.py:453-507`)."""
  out_ch: int
  act: Callable
  norm: Callable
  resample: Optional[str] = None   # None | 'down'
  dilation: int = 1
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x):
    in_ch = x.shape[-1]
    h = self.norm()(x)
    h = self.act(h)
    if self.resample == "down":
      if self.dilation > 1:
        h = ncsn_conv(in_ch, dilation=self.dilation)(h)
        h = self.norm()(h)
        h = self.act(h)
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        shortcut = ncsn_conv(self.out_ch, dilation=self.dilation)(x)
      else:
        h = ncsn_conv(in_ch)(h)
        h = self.norm()(h)
        h = self.act(h)
        h = ConvMeanPool(self.out_ch, 3, self.adjust_padding)(h)
        shortcut = ConvMeanPool(self.out_ch, 1, self.adjust_padding)(x)
    else:
      if self.dilation > 1:
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        h = self.norm()(h)
        h = self.act(h)
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        shortcut = (x if in_ch == self.out_ch
                    else ncsn_conv(self.out_ch, dilation=self.dilation)(x))
      else:
        h = ncsn_conv(self.out_ch)(h)
        h = self.norm()(h)
        h = self.act(h)
        h = ncsn_conv(self.out_ch)(h)
        shortcut = (x if in_ch == self.out_ch
                    else ncsn_conv(self.out_ch, kernel=1)(x))
    return shortcut + h


def _level(x, act, norm, out_ch, resample, dilation, adjust_padding=False):
  """One res-level = 2 residual blocks (`ncsnv2.py:62-97`)."""
  x = ResidualBlockV2(out_ch, act, norm, resample=resample,
                      dilation=dilation,
                      adjust_padding=adjust_padding)(x)
  x = ResidualBlockV2(out_ch, act, norm, resample=None,
                      dilation=dilation)(x)
  return x


class _NCSNv2Base(nn.Module):
  """Shared body; `levels` is a list of (mult, resample, dilation)."""
  config: Any
  levels: Sequence[Tuple[int, Optional[str], int]]
  refine_mults: Sequence[int]

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    config = self.config
    act = get_act(config.model.nonlinearity)
    norm = norm_lib.get_normalization(config)
    nf = config.model.nf

    h = x if config.data.centered else 2 * x - 1.0
    h = ncsn_conv(nf)(h)

    feats = []
    for mult, resample, dilation in self.levels:
      adjust = (config.data.image_size == 28 and resample == "down"
                and dilation == 4)
      h = _level(h, act, norm, mult * nf, resample, dilation, adjust)
      feats.append(h)

    ref = None
    n = len(feats)
    for i in range(n):
      layer = feats[n - 1 - i]
      xs = [layer] if ref is None else [layer, ref]
      out_ch = self.refine_mults[i] * nf
      ref = RefineBlock(out_ch, act, start=(i == 0), end=(i == n - 1))(
          xs, layer.shape[1:3])

    out = norm()(ref)
    out = act(out)
    out = ncsn_conv(x.shape[-1])(out)

    sigmas = jnp.asarray(get_sigmas(config))
    used = sigmas[labels.astype(jnp.int32)]
    return out / used.reshape((-1,) + (1,) * (x.ndim - 1))


@register_model(name="ncsnv2_64")
class NCSNv2(nn.Module):
  """<96px variant (`ncsnv2.py:43-133`)."""
  config: Any

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    levels = [(1, None, 1), (2, "down", 1), (2, "down", 2), (2, "down", 4)]
    refine = [2, 2, 1, 1]
    return _NCSNv2Base(self.config, levels, refine)(x, labels, train)


@register_model(name="ncsnv2_128")
class NCSNv2_128(nn.Module):
  """96-128px variant (`ncsnv2.py:208-295`)."""
  config: Any

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    levels = [(1, None, 1), (2, "down", 1), (2, "down", 1), (4, "down", 2),
              (4, "down", 4)]
    refine = [4, 2, 2, 1, 1]
    return _NCSNv2Base(self.config, levels, refine)(x, labels, train)


@register_model(name="ncsnv2_256")
class NCSNv2_256(nn.Module):
  """128-256px variant (`ncsnv2.py:300-415`)."""
  config: Any

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    levels = [(1, None, 1), (2, "down", 1), (2, "down", 1), (2, "down", 1),
              (4, "down", 2), (4, "down", 4)]
    refine = [4, 2, 2, 2, 1, 1]
    return _NCSNv2Base(self.config, levels, refine)(x, labels, train)


class _CondRCUBlock(nn.Module):
  features: int
  n_blocks: int
  n_stages: int
  act: Callable
  norm: Callable

  @nn.compact
  def __call__(self, x, y):
    for _ in range(self.n_blocks):
      residual = x
      for _ in range(self.n_stages):
        x = self.norm()(x, y)
        x = self.act(x)
        x = ncsn_conv(self.features, bias=False)(x)
      x = x + residual
    return x


class _CondCRPBlock(nn.Module):
  features: int
  n_stages: int
  act: Callable
  norm: Callable

  @nn.compact
  def __call__(self, x, y):
    x = self.act(x)
    path = x
    for _ in range(self.n_stages):
      path = self.norm()(path, y)
      path = nn.avg_pool(path, (5, 5), strides=(1, 1),
                         padding=((2, 2), (2, 2)))
      path = ncsn_conv(self.features, bias=False)(path)
      x = path + x
    return x


class _CondMSFBlock(nn.Module):
  features: int
  norm: Callable

  @nn.compact
  def __call__(self, xs, y, shape):
    total = 0.0
    for x in xs:
      h = self.norm()(x, y)
      h = ncsn_conv(self.features)(h)
      h = jax.image.resize(h, (h.shape[0], shape[0], shape[1], h.shape[-1]),
                           "bilinear")
      total = total + h
    return total


class _CondRefineBlock(nn.Module):
  features: int
  act: Callable
  norm: Callable
  start: bool = False
  end: bool = False

  @nn.compact
  def __call__(self, xs, y, output_shape):
    hs = [_CondRCUBlock(x.shape[-1], 2, 2, self.act, self.norm)(x, y)
          for x in xs]
    if len(xs) > 1:
      h = _CondMSFBlock(self.features, self.norm)(hs, y, output_shape)
    else:
      h = hs[0]
    h = _CondCRPBlock(self.features, 2, self.act, self.norm)(h, y)
    return _CondRCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                         self.norm)(h, y)


class _CondResidualBlock(nn.Module):
  """`models/layers.py:397-450`."""
  out_ch: int
  act: Callable
  norm: Callable
  resample: Optional[str] = None
  dilation: int = 1
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x, y):
    in_ch = x.shape[-1]
    h = self.norm()(x, y)
    h = self.act(h)
    if self.resample == "down":
      if self.dilation > 1:
        h = ncsn_conv(in_ch, dilation=self.dilation)(h)
        h = self.norm()(h, y)
        h = self.act(h)
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        shortcut = ncsn_conv(self.out_ch, dilation=self.dilation)(x)
      else:
        h = ncsn_conv(in_ch)(h)
        h = self.norm()(h, y)
        h = self.act(h)
        h = ConvMeanPool(self.out_ch, 3, self.adjust_padding)(h)
        shortcut = ConvMeanPool(self.out_ch, 1, self.adjust_padding)(x)
    else:
      if self.dilation > 1:
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        h = self.norm()(h, y)
        h = self.act(h)
        h = ncsn_conv(self.out_ch, dilation=self.dilation)(h)
        shortcut = (x if in_ch == self.out_ch
                    else ncsn_conv(self.out_ch, dilation=self.dilation)(x))
      else:
        h = ncsn_conv(self.out_ch)(h)
        h = self.norm()(h, y)
        h = self.act(h)
        h = ncsn_conv(self.out_ch)(h)
        shortcut = (x if in_ch == self.out_ch
                    else ncsn_conv(self.out_ch, kernel=1)(x))
    return shortcut + h


@register_model(name="ncsn")
class NCSN(nn.Module):
  """Class-conditional NCSNv1 (`ncsnv2.py:135-205`): conditional
  InstanceNorm++ everywhere, labels are noise-level indices."""
  config: Any

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    config = self.config
    act = get_act(config.model.nonlinearity)
    norm = norm_lib.get_normalization(config, conditional=True)
    nf = config.model.nf
    y = labels.astype(jnp.int32)

    h = x if config.data.centered else 2 * x - 1.0
    h = ncsn_conv(nf)(h)

    levels = [(1, None, 1), (2, "down", 1), (2, "down", 2), (2, "down", 4)]
    feats = []
    for mult, resample, dilation in levels:
      adjust = (config.data.image_size == 28 and resample == "down"
                and dilation == 4)
      h = _CondResidualBlock(mult * nf, act, norm, resample, dilation,
                             adjust)(h, y)
      h = _CondResidualBlock(mult * nf, act, norm, None, dilation)(h, y)
      feats.append(h)

    refine = [2, 2, 1, 1]
    ref = None
    n = len(feats)
    for i in range(n):
      layer = feats[n - 1 - i]
      xs = [layer] if ref is None else [layer, ref]
      ref = _CondRefineBlock(refine[i] * nf, act, norm, start=(i == 0),
                             end=(i == n - 1))(xs, y, layer.shape[1:3])

    out = norm()(ref, y)
    out = act(out)
    out = ncsn_conv(x.shape[-1])(out)
    sigmas = jnp.asarray(get_sigmas(config))
    used = sigmas[y]
    return out / used.reshape((-1,) + (1,) * (x.ndim - 1))


def get_network(config):
  """Dispatch by resolution (`ncsnv2.py:31-41`)."""
  if config.data.image_size < 96:
    return functools.partial(NCSNv2, config=config)
  if 96 <= config.data.image_size <= 128:
    return functools.partial(NCSNv2_128, config=config)
  if 128 < config.data.image_size <= 256:
    return functools.partial(NCSNv2_256, config=config)
  raise NotImplementedError(
      f"No network suitable for {config.data.image_size}px implemented yet.")
