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
  """`normalization.py:20-38` dispatch."""
  norm = config.model.normalization
  if conditional:
    if norm == "InstanceNorm++":
      import functools
      return functools.partial(ConditionalInstanceNorm2dPlus,
                               num_classes=config.model.num_classes)
    raise NotImplementedError(f"{norm} not implemented yet.")
  if norm == "InstanceNorm":
    return InstanceNorm2d
  if norm == "InstanceNorm++":
    return InstanceNorm2dPlus
  if norm == "VarianceNorm":
    return VarianceNorm2d
  if norm == "GroupNorm":
    return lambda: nn.GroupNorm(num_groups=32, epsilon=1e-6)
  raise ValueError(f"Unknown normalization: {norm}")
