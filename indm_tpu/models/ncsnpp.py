"""NCSN++ score U-Net (flax.linen, NHWC).

Re-design of `/root/reference/models/ncsnpp.py:34-414`. The reference builds
a flat `nn.ModuleList` consumed by a running index; here the same dataflow is
expressed directly in `@nn.compact` call order (flax names submodules by call
order, giving an equivalent flat parameter tree). Supports all config
branches the reference does: fourier/positional embeddings, ddpm/biggan
resblocks, FIR resampling, progressive input/output pyramids,
auxiliary_resblock skip bookkeeping, fourier input features, and
scale_by_sigma output scaling for VE.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from indm_tpu.models import layers
from indm_tpu.models.registry import get_sigmas, register_model


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
  """NCSN++ model. `config` is the full experiment ConfigDict."""
  config: Any

  @nn.compact
  def __call__(self, x, time_cond, train: bool = True):
    # TPU mixed precision (model.mixed_precision): convs/attention at MXU
    # bf16 rate with f32 master params, f32 GroupNorm stats + output. The
    # reference trains pure f32; this is the TPU-first headline config and
    # is off by default.
    mp = bool(self.config.model.get("mixed_precision", False))
    fgn = bool(self.config.model.get("fused_groupnorm", False))
    fdo = bool(self.config.model.get("fast_dropout", False))
    with layers.compute_dtype_scope(jnp.bfloat16 if mp else None), \
         layers.fused_groupnorm_scope(fgn), \
         layers.fast_dropout_scope(fdo):
      h = self._impl(x, time_cond, train)
    return h.astype(jnp.float32)

  def _impl(self, x, time_cond, train: bool = True):
    config = self.config
    act = layers.get_act(config.model.nonlinearity)
    nf = config.model.nf
    ch_mult = config.model.ch_mult
    num_res_blocks = config.model.num_res_blocks
    attn_resolutions = config.model.attn_resolutions
    attention = config.model.attention
    dropout = config.model.dropout
    resamp_with_conv = config.model.resamp_with_conv
    num_resolutions = len(ch_mult)
    all_resolutions = [config.data.image_size // (2 ** i)
                       for i in range(num_resolutions)]
    conditional = config.model.conditional
    fir = config.model.fir
    fir_kernel = tuple(config.model.fir_kernel)
    skip_rescale = config.model.skip_rescale
    resblock_type = config.model.resblock_type.lower()
    auxiliary_resblock = config.model.auxiliary_resblock
    progressive = config.model.progressive.lower()
    progressive_input = config.model.progressive_input.lower()
    embedding_type = config.model.embedding_type.lower()
    fourier_feature = config.model.fourier_feature
    init_scale = config.model.init_scale
    assert progressive in ["none", "output_skip", "residual"]
    assert progressive_input in ["none", "input_skip", "residual"]
    assert embedding_type in ["fourier", "positional"]
    combine_method = config.model.progressive_combine.lower()
    combiner = functools.partial(layers.Combine, method=combine_method)

    AttnBlock = functools.partial(layers.AttnBlockpp,
                                  init_scale=init_scale,
                                  skip_rescale=skip_rescale)
    Upsample = functools.partial(layers.Upsample, with_conv=resamp_with_conv,
                                 fir=fir, fir_kernel=fir_kernel)
    Downsample = functools.partial(layers.Downsample,
                                   with_conv=resamp_with_conv, fir=fir,
                                   fir_kernel=fir_kernel)
    if resblock_type == "ddpm":
      ResnetBlock = functools.partial(
          layers.ResnetBlockDDPMpp, act=act, dropout=dropout,
          init_scale=init_scale, skip_rescale=skip_rescale)
    elif resblock_type == "biggan":
      ResnetBlock = functools.partial(
          layers.ResnetBlockBigGANpp, act=act, dropout=dropout, fir=fir,
          fir_kernel=fir_kernel, init_scale=init_scale,
          skip_rescale=skip_rescale)
    else:
      raise ValueError(f"resblock type {resblock_type} unrecognized.")

    # ---- timestep / noise-level embedding (`ncsnpp.py:251-276`) ----
    if embedding_type == "fourier":
      assert config.training.continuous
      used_sigmas = time_cond
      temb = layers.GaussianFourierProjection(
          embedding_size=nf, scale=config.model.fourier_scale)(
              jnp.log(used_sigmas))
    else:  # positional
      timesteps = time_cond
      sigmas = jnp.asarray(get_sigmas(config))
      used_sigmas = sigmas[time_cond.astype(jnp.int32)]
      temb = layers.get_timestep_embedding(timesteps, nf)

    if conditional:
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros)(temb)
      temb = nn.Dense(nf * 4, kernel_init=layers.default_init(),
                      bias_init=nn.initializers.zeros)(act(temb))
    else:
      temb = None

    if not config.data.centered:
      x = 2 * x - 1.0  # input in [0,1] -> [-1,1] (`ncsnpp.py:278-280`)

    # ---- downsampling path (`ncsnpp.py:282-330`) ----
    input_pyramid = None
    if progressive_input != "none":
      input_pyramid = x

    if fourier_feature:
      x_in = layers.fixed_fourier_projection(x)
    else:
      x_in = x
    hs = [layers.conv3x3(nf)(x_in)]

    for i_level in range(num_resolutions):
      for i_block in range(num_res_blocks):
        out_ch = nf * ch_mult[i_level]
        h = ResnetBlock(out_ch=out_ch)(hs[-1], temb, train)
        if h.shape[1] in attn_resolutions and attention:
          h = AttnBlock()(h)
        hs.append(h)

      if i_level != num_resolutions - 1:
        if resblock_type == "ddpm":
          h = Downsample()(hs[-1])
        else:
          if auxiliary_resblock:
            h = ResnetBlock(down=True)(hs[-1], temb, train)

        if progressive_input == "input_skip":
          input_pyramid = layers.Downsample(fir=fir, fir_kernel=fir_kernel,
                                            with_conv=False)(input_pyramid)
          h = combiner(dim2=h.shape[-1])(input_pyramid, h)
        elif progressive_input == "residual":
          input_pyramid = layers.Downsample(
              out_ch=h.shape[-1], fir=fir, fir_kernel=fir_kernel,
              with_conv=True)(input_pyramid)
          if skip_rescale:
            input_pyramid = (input_pyramid + h) / np.sqrt(2.0)
          else:
            input_pyramid = input_pyramid + h
          h = input_pyramid

        if auxiliary_resblock:
          hs.append(h)

    h = hs[-1]
    if not auxiliary_resblock:
      hs.pop()
    h = ResnetBlock()(h, temb, train)
    h = AttnBlock()(h)
    h = ResnetBlock()(h, temb, train)

    pyramid = None

    # ---- upsampling path (`ncsnpp.py:343-398`) ----
    num_res_for_upsampling = (num_res_blocks + 1 if auxiliary_resblock
                              else num_res_blocks)
    for i_level in reversed(range(num_resolutions)):
      for i_block in range(num_res_for_upsampling):
        out_ch = nf * ch_mult[i_level]
        h = ResnetBlock(out_ch=out_ch)(
            jnp.concatenate([h, hs.pop()], axis=-1), temb, train)

      if h.shape[1] in attn_resolutions and attention:
        h = AttnBlock()(h)

      if progressive != "none":
        if i_level == num_resolutions - 1:
          if progressive == "output_skip":
            pyramid = layers.group_norm_act(h, act)
            pyramid = layers.conv3x3(x.shape[-1],
                                     init_scale=init_scale)(pyramid)
          elif progressive == "residual":
            pyramid = layers.group_norm_act(h, act)
            pyramid = layers.conv3x3(h.shape[-1])(pyramid)
        else:
          if progressive == "output_skip":
            pyramid = layers.Upsample(fir=fir, fir_kernel=fir_kernel,
                                      with_conv=False)(pyramid)
            pyramid_h = layers.group_norm_act(h, act)
            pyramid_h = layers.conv3x3(x.shape[-1],
                                       init_scale=init_scale)(pyramid_h)
            pyramid = pyramid + pyramid_h
          elif progressive == "residual":
            pyramid = layers.Upsample(out_ch=h.shape[-1], fir=fir,
                                      fir_kernel=fir_kernel,
                                      with_conv=True)(pyramid)
            if skip_rescale:
              pyramid = (pyramid + h) / np.sqrt(2.0)
            else:
              pyramid = pyramid + h
            h = pyramid

      if i_level != 0:
        if resblock_type == "ddpm":
          h = Upsample()(h)
        else:
          if auxiliary_resblock:
            h = ResnetBlock(up=True)(h, temb, train)

    assert not hs

    if progressive == "output_skip":
      h = pyramid
    else:
      h = layers.group_norm_act(h, act)
      h = layers.conv3x3(x.shape[-1], init_scale=init_scale)(h)

    if config.model.scale_by_sigma:
      h = h / used_sigmas.reshape((x.shape[0],) + (1,) * (x.ndim - 1))

    return h
