"""Wolf auxiliary components: priors, discriminators, dequantizers,
schedulers.

Ports of the remaining `/root/reference/flow_models/wolf/` pieces beyond the
INDM default path: NormalPrior (`priors/prior.py:47-81`),
CategoricalDiscriminator (`discriminators/categorical.py`),
Uniform/Flow dequantizers (`dequantization/dequantizer.py`) and the wolf LR
schedulers (`optim/lr_scheduler.py:51-115`) as optax schedules.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.flows.wolf import _ACTS


class NormalPrior:
  """Standard-normal prior (`priors/prior.py:47-81`): KL has the closed
  Gaussian form 0.5 * sum(mu^2 + e^logvar - logvar - 1)."""

  def log_probability(self, z):
    dim = z.shape[2]
    return -0.5 * (jnp.sum(z ** 2, axis=2) + math.log(2 * math.pi) * dim)

  def sample(self, rng, nsamples, dim):
    return jax.random.normal(rng, (nsamples, dim))

  def calc_kl(self, z, eps, mu, logvar):
    return 0.5 * jnp.sum(mu ** 2 + jnp.exp(logvar) - logvar - 1.0, axis=1)


class BaseDiscriminator:
  """The registry's 'base' discriminator
  (`discriminators/discriminator.py:8-95`): no encoder, no latent — the
  wolf generator runs unconditionally. sampling_and_KL yields z=None with a
  zero KL contribution, sample_from_prior yields None. Not a flax module:
  it has no parameters."""

  is_module = False

  def sampling_and_KL(self, x, y=None, train: bool = True,
                      nsamples: int = 1):
    return None, jnp.zeros((x.shape[0],), jnp.float32)

  def sample_from_prior(self, nsamples: int):
    return None


class CategoricalDiscriminator(nn.Module):
  """Class-conditional 'discriminator' (`discriminators/categorical.py`):
  z = MLP(embed(y)), KL = 0 (deterministic embedding; sampling draws y from
  a categorical prior)."""
  num_events: int
  dim: int
  activation: str = "relu"
  probs: Optional[Sequence[float]] = None
  logits: Optional[Sequence[float]] = None

  def setup(self):
    if self.probs is not None and self.logits is not None:
      raise ValueError(
          "Either `probs` or `logits` can be specified, but not both.")
    if self.probs is not None:
      self._logits = np.log(np.asarray(self.probs, np.float32))
    elif self.logits is not None:
      self._logits = np.asarray(self.logits, np.float32)
    else:
      self._logits = np.zeros((self.num_events,), np.float32)
    self.embed = nn.Embed(
        self.num_events, self.dim,
        embedding_init=nn.initializers.uniform(scale=0.2))
    act = _ACTS[self.activation]
    self._act = act
    self.fc1 = nn.Dense(4 * self.dim)
    self.fc2 = nn.Dense(4 * self.dim)
    self.fc3 = nn.Dense(self.dim)

  def encode(self, y):
    e = self.embed(y.astype(jnp.int32))
    h = self._act(self.fc1(e))
    h = self._act(self.fc2(h))
    return self.fc3(h)

  def sampling_and_KL(self, x, y=None, train: bool = True, nsamples: int = 1):
    assert y is not None, "CategoricalDiscriminator requires labels"
    z = self.encode(y)
    kl = jnp.zeros((z.shape[0],))
    return z, kl

  def sample_from_prior(self, nsamples: int):
    y = jax.random.categorical(self.make_rng("sample"),
                               jnp.asarray(self._logits), shape=(nsamples,))
    return self.encode(y)


class UniformDeQuantizer:
  """`dequantization/dequantizer.py:55-72`: u ~ U[0,1), log-prob 0."""

  def dequantize(self, rng, x, nsamples: int = 1):
    u = jax.random.uniform(rng, (x.shape[0], nsamples) + x.shape[1:])
    return u, jnp.zeros((x.shape[0], nsamples))


def preprocess(img, n_bits: int = 8, noise=None):
  """n-bit quantization + [-1,1] normalization
  (`flow_models/wolf/data/image.py:153-166`). `img` in [0,1];
  `noise` (optional, [batch, nsamples, ...]) is added to the integer
  codes for variational dequantization."""
  n_bins = 2.0 ** n_bits
  img = img * 255.0
  if n_bits < 8:
    img = jnp.floor(img / (256.0 / n_bins))
  if noise is not None:
    img = img[:, None] + noise
  return (img / n_bins - 0.5) / 0.5


def postprocess(img, n_bits: int = 8):
  """Inverse of `preprocess` back to [0,1]
  (`flow_models/wolf/data/image.py:169-177`)."""
  n_bins = 2.0 ** n_bits
  img = img * 0.5 + 0.5
  img = jnp.floor(img * n_bins) * (256.0 / n_bins)
  return jnp.clip(img, 0.0, 255.0) / 255.0


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int,
                          init_lr: float = 0.0):
  """`optim/lr_scheduler.py:51-82` as an optax-compatible schedule."""
  warmup_steps = max(1, warmup_steps)
  decay_factor = base_lr * warmup_steps ** 0.5

  def schedule(step):
    step = jnp.asarray(step, jnp.float32)
    warm = init_lr + (base_lr - init_lr) / warmup_steps * step
    decay = decay_factor * jax.lax.rsqrt(jnp.maximum(step, 1.0))
    return jnp.where(step < warmup_steps, warm, decay)

  return schedule


def exponential_schedule(base_lr: float, gamma: float, warmup_steps: int,
                         init_lr: float = 0.0):
  """`optim/lr_scheduler.py:84-115`."""
  warmup_steps = max(1, warmup_steps)

  def schedule(step):
    step = jnp.asarray(step, jnp.float32)
    warm = init_lr + (base_lr - init_lr) / warmup_steps * step
    decay = base_lr * gamma ** step
    return jnp.where(step < warmup_steps, warm, decay)

  return schedule
