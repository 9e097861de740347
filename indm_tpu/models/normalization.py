"""Normalization zoo for the legacy score networks (flax, NHWC).

Port of `/root/reference/models/normalization.py:22-215`: GroupNorm,
InstanceNorm, InstanceNorm2dPlus (+ conditional class-embedding variants),
VarianceNorm.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class InstanceNorm2d(nn.Module):
  """Non-affine instance norm over spatial dims (NHWC)."""

  @nn.compact
  def __call__(self, x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class VarianceNorm2d(nn.Module):
  """`normalization.py` VarianceNorm: scale by spatial std only."""
  bias: bool = False

  @nn.compact
  def __call__(self, x):
    c = x.shape[-1]
    alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    out = x / jnp.sqrt(var + 1e-5) * alpha
    if self.bias:
      out = out + self.param("beta", nn.initializers.zeros, (c,))
    return out


class InstanceNorm2dPlus(nn.Module):
  """InstanceNorm++ (`normalization.py:157-183`): instance norm plus a
  re-injected, batch-standardized channel-mean term."""
  bias: bool = True

  @nn.compact
  def __call__(self, x):
    c = x.shape[-1]
    alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
    gamma = self.param("gamma", nn.initializers.normal(0.02), (c,)) + 1.0
    means = jnp.mean(x, axis=(1, 2))  # [B, C]
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = InstanceNorm2d()(x)
    h = h + means[:, None, None, :] * alpha
    out = gamma * h
    if self.bias:
      out = out + self.param("beta", nn.initializers.zeros, (c,))
    return out


class NoneNorm2d(nn.Module):
  """Identity 'normalization' (`normalization.py:148-153`)."""

  @nn.compact
  def __call__(self, x):
    return x


def _cond_embed(num_classes, c, bias):
  """The reference's conditional scale/bias embedding with its exact init
  quirk (`normalization.py:43-55` etc.): gamma ~ U[0,1) (the code comment
  claims N(1,0.02) but `.uniform_()` is uniform), beta = 0."""
  if bias:
    def init(rng, shape, *a):
      g = jax.random.uniform(rng, (num_classes, c))
      return jnp.concatenate([g, jnp.zeros((num_classes, c))], axis=-1)
    return nn.Embed(num_classes, 2 * c, embedding_init=init)
  return nn.Embed(num_classes, c,
                  embedding_init=lambda rng, shape, *a: jax.random.uniform(
                      rng, (num_classes, c)))


class ConditionalBatchNorm2d(nn.Module):
  """`normalization.py:43-66`: non-affine BatchNorm scaled/shifted by a
  class embedding. Running statistics live in flax 'batch_stats'."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y, train: bool = True):
    c = x.shape[-1]
    h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                     use_scale=False)(x)
    e = _cond_embed(self.num_classes, c, self.bias)(y)
    if self.bias:
      gamma, beta = jnp.split(e, 2, axis=-1)
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    return e[:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
  """`normalization.py:69-90`."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    c = x.shape[-1]
    h = InstanceNorm2d()(x)
    e = _cond_embed(self.num_classes, c, self.bias)(y)
    if self.bias:
      gamma, beta = jnp.split(e, 2, axis=-1)
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    return e[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
  """`normalization.py:93-107`: variance-only normalization, class-embedded
  gain with init N(1, 0.02)."""
  num_classes: int
  bias: bool = False

  @nn.compact
  def __call__(self, x, y):
    c = x.shape[-1]
    embed = nn.Embed(
        self.num_classes, c,
        embedding_init=lambda rng, shape, *a: 1.0 + 0.02
        * jax.random.normal(rng, (self.num_classes, c)))(y)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    h = x / jnp.sqrt(var + 1e-5)
    return embed[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
  """`normalization.py:126-145`: pure class-conditional affine."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    c = x.shape[-1]
    e = _cond_embed(self.num_classes, c, self.bias)(y)
    if self.bias:
      gamma, beta = jnp.split(e, 2, axis=-1)
      return gamma[:, None, None, :] * x + beta[:, None, None, :]
    return e[:, None, None, :] * x


class ConditionalInstanceNorm2dPlus(nn.Module):
  """Class-conditional InstanceNorm++ (`normalization.py:186-215`)."""
  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x, y):
    c = x.shape[-1]
    n = 3 if self.bias else 2
    embed = nn.Embed(self.num_classes, c * n,
                     embedding_init=nn.initializers.normal(0.02))(y)
    means = jnp.mean(x, axis=(1, 2))
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = InstanceNorm2d()(x)
    if self.bias:
      gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
      h = h + means[:, None, None, :] * (alpha[:, None, None, :] + 1.0)
      return (gamma[:, None, None, :] + 1.0) * h + beta[:, None, None, :]
    gamma, alpha = jnp.split(embed, 2, axis=-1)
    h = h + means[:, None, None, :] * (alpha[:, None, None, :] + 1.0)
    return (gamma[:, None, None, :] + 1.0) * h


def get_normalization(config, conditional: bool = False) -> Callable:
  """`normalization.py:20-38` dispatch, extended over the full zoo: the
  reference's dispatch raises for conditional variants other than
  InstanceNorm++ even though the classes exist (`:43-155`); here every
  variant is constructible so class-conditional NCSN configurations run."""
  import functools
  norm = config.model.normalization
  if conditional:
    nc = config.model.num_classes
    table = {
        "InstanceNorm++": ConditionalInstanceNorm2dPlus,
        "InstanceNorm": ConditionalInstanceNorm2d,
        "BatchNorm": ConditionalBatchNorm2d,
        "VarianceNorm": ConditionalVarianceNorm2d,
        "NoneNorm": ConditionalNoneNorm2d,
    }
    if norm in table:
      return functools.partial(table[norm], num_classes=nc)
    raise NotImplementedError(f"{norm} not implemented yet.")
  if norm == "InstanceNorm":
    return InstanceNorm2d
  if norm == "InstanceNorm++":
    return InstanceNorm2dPlus
  if norm == "VarianceNorm":
    return VarianceNorm2d
  if norm == "NoneNorm":
    return NoneNorm2d
  if norm == "GroupNorm":
    return lambda: nn.GroupNorm(num_groups=32, epsilon=1e-6)
  raise ValueError(f"Unknown normalization: {norm}")
