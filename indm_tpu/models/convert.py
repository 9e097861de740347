"""Load reference PyTorch NCSN++ checkpoints into the flax model.

The reference publishes pretrained INDM checkpoints (torch-pickled dicts
whose `model` entry is a DataParallel state_dict of
`/root/reference/models/ncsnpp.py`). Its NCSN++ builds a flat
`nn.ModuleList` consumed by a running index (`all_modules.{i}.*` keys,
construction order == forward-consumption order, asserted at
`ncsnpp.py:409`); our flax module expresses the same dataflow in
`@nn.compact` call order. Because the torch reference was itself ported
from flax, the INNER module names coincide (`Conv_0`, `Dense_0`,
`GroupNorm_0`, `NIN_0`, ...) — this converter replicates the reference's
construction walk (`ncsnpp.py:73-249`) to pair each `all_modules.{i}`
with the corresponding flax submodule name, and transposes tensors
(conv OIHW -> HWIO, linear [out,in] -> [in,out]).

Tested against the ACTUAL reference module in
`tests/test_reference_parity.py` (forward parity <= 1e-4 through this
converter on randomly-initialized weights, biggan/fir/fourier and
ddpm/positional variants).
"""

from __future__ import annotations

import collections

import numpy as np


def _t(x):
  return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def strip_module_prefix(state_dict):
  """Drop the DataParallel 'module.' prefix (`utils.py:36-48` stores
  DataParallel-wrapped state dicts)."""
  return {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}


def _conv(sd, pfx):
  out = {"kernel": _t(sd[f"{pfx}.weight"]).transpose(2, 3, 1, 0)}
  if f"{pfx}.bias" in sd:
    out["bias"] = _t(sd[f"{pfx}.bias"])
  return out


def _fir_conv(sd, pfx):
  # up_or_down_sampling.Conv2d: weight [O,I,k,k] -> ours FIRConv2d
  # ("weight" HWIO + "bias")
  out = {"weight": _t(sd[f"{pfx}.weight"]).transpose(2, 3, 1, 0)}
  if f"{pfx}.bias" in sd:
    out["bias"] = _t(sd[f"{pfx}.bias"])
  return out


def _linear(sd, pfx):
  return {"kernel": _t(sd[f"{pfx}.weight"]).T,
          "bias": _t(sd[f"{pfx}.bias"])}


def _gn(sd, pfx):
  return {"scale": _t(sd[f"{pfx}.weight"]), "bias": _t(sd[f"{pfx}.bias"])}


def _nin(sd, pfx):
  return {"W": _t(sd[f"{pfx}.W"]), "b": _t(sd[f"{pfx}.b"])}


def ncsnpp_params_from_torch(state_dict, config):
  """torch NCSNpp state_dict (reference `models/ncsnpp.py`) -> (params,
  buffers) pytrees for `indm_tpu.models.ncsnpp.NCSNpp` (the fourier
  projection's fixed W lives in the flax 'buffers' collection)."""
  sd = strip_module_prefix(state_dict)
  buffers = {}

  nf = config.model.nf
  ch_mult = config.model.ch_mult
  num_res_blocks = config.model.num_res_blocks
  attn_resolutions = config.model.attn_resolutions
  attention = config.model.attention
  resamp_with_conv = config.model.resamp_with_conv
  num_resolutions = len(ch_mult)
  all_resolutions = [config.data.image_size // (2 ** i)
                     for i in range(num_resolutions)]
  conditional = config.model.conditional
  fir = config.model.fir
  resblock_type = config.model.resblock_type.lower()
  biggan = resblock_type == "biggan"
  auxiliary_resblock = config.model.auxiliary_resblock
  progressive = config.model.progressive.lower()
  progressive_input = config.model.progressive_input.lower()
  embedding_type = config.model.embedding_type.lower()
  fourier_feature = config.model.fourier_feature
  combine_method = config.model.progressive_combine.lower()
  channels = config.data.num_channels

  params = {}
  counters = collections.defaultdict(int)
  midx = [0]

  def our(cls):
    i = counters[cls]
    counters[cls] += 1
    return f"{cls}_{i}"

  def ref():
    i = midx[0]
    midx[0] += 1
    return f"all_modules.{i}"

  def resblock(in_ch, out_ch, updown=False):
    pfx = ref()
    d = {"GroupNorm_0": _gn(sd, f"{pfx}.GroupNorm_0"),
         "Conv_0": _conv(sd, f"{pfx}.Conv_0"),
         "Dense_0": _linear(sd, f"{pfx}.Dense_0"),
         "GroupNorm_1": _gn(sd, f"{pfx}.GroupNorm_1"),
         "Conv_1": _conv(sd, f"{pfx}.Conv_1")}
    if biggan:
      if in_ch != out_ch or updown:
        d["Conv_2"] = _conv(sd, f"{pfx}.Conv_2")
      params[our("ResnetBlockBigGANpp")] = d
    else:
      if in_ch != out_ch:
        # reference DDPM++ default conv_shortcut=False -> NIN_0
        d["NIN_0"] = _nin(sd, f"{pfx}.NIN_0")
      params[our("ResnetBlockDDPMpp")] = d

  def attnblock():
    pfx = ref()
    params[our("AttnBlockpp")] = {
        "GroupNorm_0": _gn(sd, f"{pfx}.GroupNorm_0"),
        "NIN_0": _nin(sd, f"{pfx}.NIN_0"),
        "NIN_1": _nin(sd, f"{pfx}.NIN_1"),
        "NIN_2": _nin(sd, f"{pfx}.NIN_2"),
        "NIN_3": _nin(sd, f"{pfx}.NIN_3")}

  def updown_module(cls):
    """Upsample/Downsample WITH conv (the parameterless variants are
    `self.pyramid_*` attributes in the reference, not all_modules
    entries)."""
    pfx = ref()
    if fir:
      params[our(cls)] = {"FIRConv2d_0": _fir_conv(sd, f"{pfx}.Conv2d_0")}
    else:
      params[our(cls)] = {"Conv_0": _conv(sd, f"{pfx}.Conv_0")}

  # ---- embedding (`ncsnpp.py:74-98`) ----
  if embedding_type == "fourier":
    buffers[our("GaussianFourierProjection")] = {"W": _t(sd[f"{ref()}.W"])}
  if conditional:
    params[our("Dense")] = _linear(sd, ref())
    params[our("Dense")] = _linear(sd, ref())
  if fourier_feature:
    ref()  # FixedFouriereProjection: parameterless all_modules entry

  # ---- stem ----
  params[our("Conv")] = _conv(sd, ref())
  hs_c = [nf]
  in_ch = nf

  # ---- downsampling path (`ncsnpp.py:151-197`) ----
  input_pyramid_ch = channels
  for i_level in range(num_resolutions):
    for _ in range(num_res_blocks):
      out_ch = nf * ch_mult[i_level]
      resblock(in_ch, out_ch)
      in_ch = out_ch
      if all_resolutions[i_level] in attn_resolutions and attention:
        attnblock()
      hs_c.append(in_ch)
    if i_level != num_resolutions - 1:
      if resblock_type == "ddpm":
        if resamp_with_conv:
          updown_module("Downsample")
        else:
          ref()  # parameterless Downsample
          counters["Downsample"] += 1
      elif auxiliary_resblock:
        resblock(in_ch, in_ch, updown=True)
      if progressive_input == "input_skip":
        # our _impl calls a parameterless layers.Downsample first, THEN the
        # combiner; the reference's pyramid_downsample is a shared attribute
        # (no all_modules entry)
        counters["Downsample"] += 1
        pfx = ref()
        params[our("Combine")] = {"Conv_0": _conv(sd, f"{pfx}.Conv_0")}
        if combine_method == "cat":
          in_ch *= 2
      elif progressive_input == "residual":
        updown_module("Downsample")
        input_pyramid_ch = in_ch
      if auxiliary_resblock:
        hs_c.append(in_ch)

  in_ch = hs_c[-1]
  if not auxiliary_resblock:
    hs_c.pop()

  # ---- middle ----
  resblock(in_ch, in_ch)
  attnblock()
  resblock(in_ch, in_ch)

  # ---- upsampling path (`ncsnpp.py:199-241`) ----
  pyramid_ch = 0
  num_res_for_upsampling = (num_res_blocks + 1 if auxiliary_resblock
                            else num_res_blocks)
  for i_level in reversed(range(num_resolutions)):
    for _ in range(num_res_for_upsampling):
      out_ch = nf * ch_mult[i_level]
      resblock(in_ch + hs_c.pop(), out_ch)
      in_ch = out_ch
    if all_resolutions[i_level] in attn_resolutions and attention:
      attnblock()
    if progressive != "none":
      if i_level == num_resolutions - 1:
        params[our("GroupNorm")] = _gn(sd, ref())
        params[our("Conv")] = _conv(sd, ref())
        pyramid_ch = channels if progressive == "output_skip" else in_ch
      else:
        if progressive == "output_skip":
          counters["Upsample"] += 1  # our parameterless pyramid upsample
          params[our("GroupNorm")] = _gn(sd, ref())
          params[our("Conv")] = _conv(sd, ref())
          pyramid_ch = channels
        else:  # residual
          updown_module("Upsample")
          pyramid_ch = in_ch
    if i_level != 0:
      if resblock_type == "ddpm":
        if resamp_with_conv:
          updown_module("Upsample")
        else:
          ref()
          counters["Upsample"] += 1
      elif auxiliary_resblock:
        resblock(in_ch, in_ch, updown=True)

  assert not hs_c, "converter walk out of sync with the architecture"

  # ---- output head ----
  if progressive != "output_skip":
    params[our("GroupNorm")] = _gn(sd, ref())
    params[our("Conv")] = _conv(sd, ref())

  leftover = [k for k in sd
              if k.startswith("all_modules.")
              and int(k.split(".")[1]) >= midx[0]]
  assert not leftover, f"unconsumed reference modules: {sorted(leftover)[:5]}"
  return params, buffers


def ema_state_dict_from_torch(ckpt, config):
  """Rebuild an EMA state_dict from a reference checkpoint dict.

  The reference EMA (`/root/reference/models/ema.py:28-29`) stores
  `shadow_params` as a bare LIST ordered like `model.parameters()` with
  `requires_grad=True` — i.e. the model state_dict's insertion order minus
  buffers ('sigmas') and the fourier projection's fixed W
  (requires_grad=False Parameter). Returns a state_dict-shaped mapping of
  the EMA values, suitable for `ncsnpp_params_from_torch`."""
  model_sd = strip_module_prefix(ckpt["model"])
  shadow = ckpt["ema"]["shadow_params"]
  fourier = config.model.embedding_type.lower() == "fourier"
  grad_keys = [k for k in model_sd
               if k != "sigmas"
               and not (fourier and k == "all_modules.0.W")]
  assert len(grad_keys) == len(shadow), (
      f"EMA shadow length {len(shadow)} != trainable params "
      f"{len(grad_keys)}")
  ema_sd = dict(model_sd)
  for k, v in zip(grad_keys, shadow):
    ema_sd[k] = v
  return ema_sd
