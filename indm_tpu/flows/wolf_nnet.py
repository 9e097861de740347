"""Remaining wolf nnet building blocks (`flow_models/wolf/nnet/`).

TPU-native (NHWC, flax.linen) equivalents of:
  * `nnet/attention.py` — MultiHeadAttention (sequence) and
    MultiHeadAttention2d (spatial, residual, no output projection);
  * `nnet/positional_encoding.py` — sinusoidal table (tensor2tensor form:
    [sin | cos] concatenated, position 0 zeroed for padding);
  * `nnet/adaptive_instance_norm.py` — AdaIN2d (instance-norm modulated by
    a conditioning vector, zero-initialized so it starts as plain IN);
  * `nnet/weight_norm.py` — weight-normalized ConvTranspose (the Dense and
    Conv variants live in `wolf.py` / `wolf_glow.py`).

Attention math is batched einsum over heads — one MXU-friendly contraction,
no per-head Python loop.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MultiHeadAttention(nn.Module):
  """Self/cross attention over [batch, len, model_dim] with a residual +
  LayerNorm output (`attention.py:13-123`)."""
  model_dim: int
  heads: int
  dropout: float = 0.0
  mask_diag: bool = False

  @nn.compact
  def __call__(self, query, key=None, value=None, key_mask=None,
               train: bool = True):
    key = query if key is None else key
    value = key if value is None else value
    assert self.model_dim % self.heads == 0
    dim = self.model_dim // self.heads
    residual = query

    qkv_proj = nn.Dense(3 * self.model_dim,
                        kernel_init=nn.initializers.xavier_uniform())
    if key is query and value is query:
      q, k, v = jnp.split(qkv_proj(query), 3, axis=-1)
    else:
      # one shared in-projection matrix, sliced per input
      # (`attention.py:127-147`)
      q = jnp.split(qkv_proj(query), 3, axis=-1)[0]
      k = jnp.split(qkv_proj(key), 3, axis=-1)[1]
      v = jnp.split(qkv_proj(value), 3, axis=-1)[2]
    q = q * dim ** -0.5

    def split_heads(x):
      b, t, _ = x.shape
      return x.reshape(b, t, self.heads, dim)

    q, k, v = map(split_heads, (q, k, v))
    # [batch, heads, tgt, src]
    logits = jnp.einsum("bthd,bshd->bhts", q, k)
    if key_mask is not None:
      logits = jnp.where(key_mask[:, None, None, :], -jnp.inf, logits)
    if self.mask_diag:
      t = logits.shape[-1]
      logits = jnp.where(jnp.eye(t, dtype=bool)[None, None], -jnp.inf,
                         logits)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", weights, v)
    out = out.reshape(query.shape[0], query.shape[1], self.model_dim)
    if self.dropout > 0.0 and train:
      out = nn.Dropout(self.dropout, deterministic=False)(out)
    return nn.LayerNorm()(out + residual)


class MultiHeadAttention2d(nn.Module):
  """Spatial self-attention on NHWC maps with residual output and no output
  projection (`attention.py:150-195`)."""
  channels: int
  heads: int
  dropout: float = 0.0

  @nn.compact
  def __call__(self, x, pos_enc=None, train: bool = True):
    if pos_enc is not None:
      x = x + pos_enc
    b, hgt, wdt, c = x.shape
    assert c == self.channels and c % self.heads == 0
    dim = c // self.heads
    qkv = nn.Conv(3 * c, (1, 1), use_bias=True)(x)
    qkv = qkv.reshape(b, hgt * wdt, 3, self.heads, dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(dim)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", weights, v)
    out = out.reshape(b, hgt, wdt, c)
    if self.dropout > 0.0 and train:
      out = nn.Dropout(self.dropout, deterministic=False)(out)
    return x + out


def positional_encoding_table(num_encodings: int, encoding_dim: int,
                              padding_idx: Optional[int] = 0) -> np.ndarray:
  """Sinusoidal table, tensor2tensor layout ([all sins | all cos])
  (`positional_encoding.py:26-45`)."""
  half_dim = encoding_dim // 2
  emb = math.log(10000) / (half_dim - 1)
  emb = np.exp(np.arange(half_dim, dtype=np.float32) * -emb)
  emb = np.arange(num_encodings, dtype=np.float32)[:, None] * emb[None, :]
  table = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
  if encoding_dim % 2 == 1:
    table = np.concatenate(
        [table, np.zeros((num_encodings, 1), np.float32)], axis=1)
  if padding_idx is not None:
    table[padding_idx, :] = 0.0
  return table.astype(np.float32)


class AdaIN2d(nn.Module):
  """Instance norm modulated by a conditioning vector
  (`adaptive_instance_norm.py:7-26`): y = IN(x) * (s+1) + b with (b, s) =
  Linear(h) zero-initialized."""
  in_channels: int

  @nn.compact
  def __call__(self, x, h):
    stats = nn.Dense(2 * self.in_channels,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
    b, s = jnp.split(stats, 2, axis=-1)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return x * (s[:, None, None, :] + 1.0) + b[:, None, None, :]


class ConvTransposeWeightNorm(nn.Module):
  """Weight-normalized transposed conv (`nnet/weight_norm.py:84-128`):
  w = g * v/||v||, v ~ N(0, 0.05), g init ||v||."""
  features: int
  kernel_size: tuple
  strides: tuple = (1, 1)

  @nn.compact
  def __call__(self, x):
    in_ch = x.shape[-1]
    shape = self.kernel_size + (in_ch, self.features)
    v = self.param("v", nn.initializers.normal(0.05), shape)
    g = self.param(
        "g", lambda rng: jnp.sqrt(
            jnp.sum(nn.initializers.normal(0.05)(rng, shape) ** 2,
                    axis=(0, 1, 2))))
    b = self.param("b", nn.initializers.zeros, (self.features,))
    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1, 2)) + 1e-12)
    w = v * (g / norm)
    y = jax.lax.conv_transpose(
        x, w, strides=self.strides, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b
