"""Coupling layers + elementwise transforms for residual flows (NHWC).

Port of `/root/reference/flow_models/resflow/layers/coupling.py` (affine
couplings with sigmoid(s+2) scales; channel and checkerboard masks),
`layers/elemwise.py` (ZeroMean / Normalize / Logit transforms) and the
coupling-net builders used by `StackedCouplingBlocks`
(`resflow_.py:588-730`). Functional protocol as in indm_tpu.flows.resflow.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.flows.resflow import ACT_FNS


class ConvNet:
  """Plain (unconstrained) conv net used inside coupling blocks
  (`resflow_.py:688-704`): conv -> act -> conv -> act -> conv, NHWC."""

  def __init__(self, in_ch, out_ch, idim, kernels=(3, 1, 3), act="elu"):
    self.dims = [in_ch] + [idim] * (len(kernels) - 1) + [out_ch]
    self.kernels = kernels
    self.act = ACT_FNS[act]

  def init(self, rng):
    params = []
    keys = jax.random.split(rng, len(self.kernels))
    for i, (k, key) in enumerate(zip(self.kernels, keys)):
      fan_in = self.dims[i] * k * k
      bound = 1.0 / math.sqrt(fan_in)
      w = jax.random.uniform(key, (k, k, self.dims[i], self.dims[i + 1]),
                             minval=-bound, maxval=bound)
      params.append({"w": w, "b": jnp.zeros((self.dims[i + 1],))})
    return params

  def apply(self, params, x, h=None):
    for i, p in enumerate(params):
      x = jax.lax.conv_general_dilated(
          x, p["w"], (1, 1), "SAME",
          dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
      if i < len(params) - 1:
        x = self.act(x)
    return x


class CouplingBlock:
  """Affine coupling on a channel split (`coupling.py:8-87`):
  y_b = x_b * sigmoid(s(x_a)+2) + t(x_a)."""

  def __init__(self, dim, nnet, swap: bool = False):
    assert dim % 2 == 0
    self.d = dim // 2
    self.nnet = nnet
    self.swap = swap

  def init(self, rng):
    return {"nnet": self.nnet.init(rng)}

  def _s_t(self, params, x, h):
    f = self.nnet.apply(params["nnet"], x, h=h)
    return f[..., :self.d], f[..., self.d:]

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    xa = x[..., :self.d] if not self.swap else x[..., self.d:]
    xb = x[..., self.d:] if not self.swap else x[..., :self.d]
    s, t = self._s_t(params, xa, h)
    scale = jax.nn.sigmoid(s + 2.0)
    yb = xb * scale + t
    ld = jnp.sum(jnp.log(scale).reshape(x.shape[0], -1), axis=-1)
    y = ([xa, yb] if not self.swap else [yb, xa])
    y = jnp.concatenate(y, axis=-1)
    return y, (None if logpx is None else logpx - ld)

  def inverse(self, params, y, logpy=None, h=None, **kw):
    ya = y[..., :self.d] if not self.swap else y[..., self.d:]
    yb = y[..., self.d:] if not self.swap else y[..., :self.d]
    s, t = self._s_t(params, ya, h)
    scale = jax.nn.sigmoid(s + 2.0)
    xb = (yb - t) / scale
    ld = jnp.sum(jnp.log(scale).reshape(y.shape[0], -1), axis=-1)
    x = ([ya, xb] if not self.swap else [xb, ya])
    x = jnp.concatenate(x, axis=-1)
    return x, (None if logpy is None else logpy + ld)


class ChannelCouplingBlock(CouplingBlock):
  """`coupling.py:90-104`."""

  def __init__(self, dim, nnet, mask_type: str = "channel0"):
    swap = {"channel0": False, "channel1": True}[mask_type]
    super().__init__(dim, nnet, swap)


def checkerboard_mask(shape, mask_type: str):
  """`layers/mask_utils.py` checkerboard over H, W (NHWC)."""
  _, h, w, c = shape
  grid = (jnp.arange(h)[:, None] + jnp.arange(w)[None, :]) % 2
  if mask_type.endswith("1"):
    grid = 1 - grid
  return grid.astype(jnp.float32)[None, :, :, None]


class MaskedCouplingBlock:
  """Checkerboard-masked affine coupling (`coupling.py:107-155`)."""

  def __init__(self, dim, nnet, mask_type: str = "checkerboard0"):
    self.d = dim
    self.nnet = nnet
    self.mask_type = mask_type

  def init(self, rng):
    return {"nnet": self.nnet.init(rng)}

  def _s_t(self, params, x, h):
    f = self.nnet.apply(params["nnet"], x, h=h)
    s = jax.nn.sigmoid(f[..., :self.d] + 2.0)
    t = f[..., self.d:]
    return s, t

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    b = checkerboard_mask(x.shape, self.mask_type)
    xa = b * x
    s, t = self._s_t(params, xa, h)
    y = (x * s + t) * (1 - b) + xa
    if logpx is None:
      return y, None
    ld = jnp.sum((jnp.log(s) * (1 - b)).reshape(x.shape[0], -1), axis=-1)
    return y, logpx - ld

  def inverse(self, params, y, logpy=None, h=None, **kw):
    b = checkerboard_mask(y.shape, self.mask_type)
    ya = b * y
    s, t = self._s_t(params, ya, h)
    x = ya + (1 - b) * (y - t) / s
    if logpy is None:
      return x, None
    ld = jnp.sum((jnp.log(s) * (1 - b)).reshape(y.shape[0], -1), axis=-1)
    return x, logpy + ld


# ---------------------------------------------------------------------------
# Elementwise transforms (`layers/elemwise.py`)
# ---------------------------------------------------------------------------


class ZeroMeanTransform:
  def init(self, rng):
    return {}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    return x - 0.5, logpx

  def inverse(self, params, y, logpy=None, h=None, **kw):
    return y + 0.5, logpy


class Normalize:
  def __init__(self, mean, std):
    self.mean = jnp.asarray(mean)
    self.std = jnp.asarray(std)

  def init(self, rng):
    return {}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = (x - self.mean) / self.std
    if logpx is None:
      return y, None
    d = np.prod(x.shape[1:]) / x.shape[-1]
    ld = -jnp.sum(jnp.log(self.std)) * d
    return y, logpx - ld

  def inverse(self, params, y, logpy=None, h=None, **kw):
    x = y * self.std + self.mean
    if logpy is None:
      return x, None
    d = np.prod(y.shape[1:]) / y.shape[-1]
    ld = -jnp.sum(jnp.log(self.std)) * d
    return x, logpy + ld


class LogitTransform:
  """alpha-logit with log-det (`layers/elemwise.py`):
  y = logit(alpha + (1-2 alpha) x)."""

  def __init__(self, alpha: float = 0.05):
    self.alpha = alpha

  def init(self, rng):
    return {}

  def _logdet(self, x):
    a = self.alpha
    s = a + (1 - 2 * a) * x
    ld = jnp.log(1 - 2 * a) - jnp.log(s) - jnp.log(1 - s)
    return jnp.sum(ld.reshape(x.shape[0], -1), axis=-1)

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    a = self.alpha
    s = a + (1 - 2 * a) * x
    y = jnp.log(s) - jnp.log(1 - s)
    if logpx is None:
      return y, None
    return y, logpx - self._logdet(x)

  def inverse(self, params, y, logpy=None, h=None, **kw):
    a = self.alpha
    s = jax.nn.sigmoid(y)
    x = (s - a) / (1 - 2 * a)
    if logpy is None:
      return x, None
    return x, logpy + self._logdet(x)
