"""Classic DDPM U-Net (flax, NHWC).

Re-design of `/root/reference/models/ddpm.py:39-181`: sinusoidal time
embedding, DDPM resblocks, attention at attn_resolutions, nearest-neighbor
up / strided-conv (or avg-pool) down, optional scale_by_sigma.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from indm_tpu.models import layers
from indm_tpu.models.registry import get_sigmas, register_model


class _DDPMResBlock(nn.Module):
  """Legacy ResnetBlockDDPM (`models/layers.py:616-661` flavor, without the
  ++ skip rescale)."""
  act: Any
  out_ch: int
  dropout: float

  @nn.compact
  def __call__(self, x, temb=None, train: bool = True):
    in_ch = x.shape[-1]
    # reference uses num_groups=32 (always C>=128 there); min() keeps tiny
    # test configs valid with identical behavior at real widths.
    h = layers.group_norm_act(x, self.act, num_groups=min(32, in_ch))
    h = layers.conv3x3(self.out_ch)(h)
    if temb is not None:
      h += nn.Dense(self.out_ch, kernel_init=layers.default_init(),
                    bias_init=nn.initializers.zeros)(
                        self.act(temb))[:, None, None, :]
    h = layers.group_norm_act(h, self.act, num_groups=min(32, self.out_ch))
    h = nn.Dropout(self.dropout)(h, deterministic=not train)
    h = layers.conv3x3(self.out_ch, init_scale=0.0)(h)
    if in_ch != self.out_ch:
      x = layers.NIN(self.out_ch)(x)
    return x + h


class _LegacyAttn(nn.Module):
  """Legacy AttnBlock (`models/layers.py:558-580` flavor)."""

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    h = layers.group_norm_act(x, None, num_groups=min(32, C))
    q = layers.NIN(C)(h)
    k = layers.NIN(C)(h)
    v = layers.NIN(C)(h)
    w = jnp.einsum("bhwc,bijc->bhwij", q, k) * (int(C) ** (-0.5))
    w = jax.nn.softmax(w.reshape(B, H, W, H * W), axis=-1)
    w = w.reshape(B, H, W, H, W)
    h = jnp.einsum("bhwij,bijc->bhwc", w, v)
    h = layers.NIN(C, init_scale=0.0)(h)
    return x + h


@register_model(name="ddpm")
class DDPM(nn.Module):
  config: Any

  @nn.compact
  def __call__(self, x, labels, train: bool = True):
    fgn = bool(self.config.model.get("fused_groupnorm", False))
    with layers.fused_groupnorm_scope(fgn):
      return self._impl(x, labels, train)

  def _impl(self, x, labels, train: bool = True):
    config = self.config
    act = layers.get_act(config.model.nonlinearity)
    nf = config.model.nf
    ch_mult = config.model.ch_mult
    num_res_blocks = config.model.num_res_blocks
    attn_resolutions = config.model.attn_resolutions
    dropout = config.model.dropout
    resamp_with_conv = config.model.resamp_with_conv
    num_resolutions = len(ch_mult)

    if config.model.conditional:
      temb = layers.get_timestep_embedding(labels, nf)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros)(temb)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros)(act(temb))
    else:
      temb = None

    h = x if config.data.centered else 2 * x - 1.0

    hs = [layers.conv3x3(nf)(h)]
    for i_level in range(num_resolutions):
      for _ in range(num_res_blocks):
        h = _DDPMResBlock(act=act, out_ch=nf * ch_mult[i_level],
                          dropout=dropout)(hs[-1], temb, train)
        if h.shape[1] in attn_resolutions:
          h = _LegacyAttn()(h)
        hs.append(h)
      if i_level != num_resolutions - 1:
        # legacy Downsample (`models/layers.py:597-614`)
        d = hs[-1]
        if resamp_with_conv:
          d = layers.conv3x3(d.shape[-1], stride=2)(d)
        else:
          d = nn.avg_pool(d, (2, 2), strides=(2, 2))
        hs.append(d)

    h = hs[-1]
    h = _DDPMResBlock(act=act, out_ch=h.shape[-1], dropout=dropout)(
        h, temb, train)
    h = _LegacyAttn()(h)
    h = _DDPMResBlock(act=act, out_ch=h.shape[-1], dropout=dropout)(
        h, temb, train)

    for i_level in reversed(range(num_resolutions)):
      for _ in range(num_res_blocks + 1):
        h = _DDPMResBlock(act=act, out_ch=nf * ch_mult[i_level],
                          dropout=dropout)(
                              jnp.concatenate([h, hs.pop()], axis=-1),
                              temb, train)
      if h.shape[1] in attn_resolutions:
        h = _LegacyAttn()(h)
      if i_level != 0:
        B, H, W, C = h.shape
        h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
        if resamp_with_conv:
          h = layers.conv3x3(C)(h)

    assert not hs
    h = layers.group_norm_act(h, act, num_groups=min(32, h.shape[-1]))
    h = layers.conv3x3(x.shape[-1], init_scale=0.0)(h)

    if config.model.scale_by_sigma:
      sigmas = jnp.asarray(get_sigmas(config))
      used = sigmas[labels.astype(jnp.int32)]
      h = h / used.reshape((-1, 1, 1, 1))
    return h
