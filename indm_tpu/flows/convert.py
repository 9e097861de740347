"""Load reference PyTorch wolf/INDM flow checkpoints into the jax flow model.

The reference's flow checkpoint (`/root/reference/utils.py:114-145`
`load_flow_model` + `utils.py:36-48` `save_checkpoint`) is a torch-pickled
dict {optimizer, model, ema, step}; `model` is a DataParallel state_dict of
the `WolfCore` built by `flow_models/flow_model.py:86-110` from the
config's wolf JSON (the published INDM checkpoints all use
`resflow-gaussian-uni.json`: resflow generator + global ResNet-BN encoder
Gaussian discriminator + 2-step NICE flow prior).

This module maps that state_dict onto the (params, buffers) pytrees of
`indm_tpu.flows.flow_model.FlowModel` — the mirror of
`indm_tpu/models/convert.py` for the flow half of a checkpoint pair.
Layout conventions (verified by the parity tests in
`tests/test_flow_checkpoint_convert.py` against the ACTUAL reference
WolfCore run on CPU):

  * conv weights OIHW -> HWIO; linear [out, in] -> [in, out];
  * torch weight-norm (weight_g [out,1], weight_v [out,in]) ->
    DenseWeightNorm {g [out], v [in,out], b};
  * the reference's per-conv `scale` entries are monitoring buffers
    (`wolf resflow layers/base/lipschitz.py:348,354` — copied, never read
    back into the weight) and are dropped;
  * `geom_p`/`lamb` are torch Parameters (requires_grad=True, hence
    present in the EMA shadow list) but inert under learn_p=False — they
    participate in EMA *ordering* and are otherwise dropped;
  * BatchNorm running statistics land in the flax `batch_stats` buffer
    collection.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from indm_tpu.models.convert import strip_module_prefix


def _t(x):
  return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


# Non-parameter state entries of the reference WolfCore (everything else in
# the state_dict is a torch Parameter, in `model.parameters()` order —
# verified: all 442 named parameters of the INDM preset have
# requires_grad=True, including geom_p/lamb).
_BUFFER_SUFFIXES = (
    "last_n_samples", "last_firmom", "last_secmom",
    "running_mean", "running_var", "num_batches_tracked", "weight_inv",
)


def _is_buffer_key(k: str) -> bool:
  if k.endswith(_BUFFER_SUFFIXES):
    return True
  # per-conv Lipschitz monitoring scalar (`lipschitz.py:348`): only the
  # generator's nnet convs have it; actnorm 'log_scale' is a parameter.
  return k.endswith(".scale") and ".nnet." in k


def flow_param_keys(state_dict) -> List[str]:
  """state_dict keys that are torch Parameters, in state-dict order (==
  `model.parameters()` order, which is the reference EMA shadow order)."""
  return [k for k in state_dict if not _is_buffer_key(k)]


def flow_ema_state_dict_from_torch(ckpt) -> Dict:
  """Rebuild an EMA-weighted state_dict from a reference flow checkpoint.

  The reference EMA (`/root/reference/models/ema.py:28-29`) stores
  `shadow_params` as a bare list ordered like `model.parameters()` with
  requires_grad=True — for the WolfCore that is every state_dict entry
  except the named buffers above (geom_p/lamb included)."""
  model_sd = strip_module_prefix(ckpt["model"])
  shadow = ckpt["ema"]["shadow_params"]
  keys = flow_param_keys(model_sd)
  assert len(keys) == len(shadow), (
      f"EMA shadow length {len(shadow)} != trainable params {len(keys)}")
  ema_sd = dict(model_sd)
  for k, v in zip(keys, shadow):
    ema_sd[k] = v
  return ema_sd


# ---------------------------------------------------------------------------
# generator (wolf resflow tree -> indm_tpu.flows.resflow params)
# ---------------------------------------------------------------------------


def _lip_conv(sd, pfx):
  d = {"w": _t(sd[f"{pfx}.weight"]).transpose(2, 3, 1, 0),
       "b": _t(sd[f"{pfx}.bias"])}
  if f"{pfx}.h_net.net.weight" in sd:
    d["h_w"] = _t(sd[f"{pfx}.h_net.net.weight"]).T
    d["h_b"] = _t(sd[f"{pfx}.h_net.net.bias"])
  return d


def _iresblock(sd, pfx, preact: bool):
  """One reference iResBlock's nnet (3-conv Lipschitz chain). With preact
  the torch nn.Sequential starts with the activation module, shifting the
  conv indices by one (`resflow_.py:442-463`)."""
  off = 1 if preact else 0
  convs = []
  for j in range(3):
    idx = off + 2 * j
    assert f"{pfx}.nnet.{idx}.weight" in sd, (
        f"converter walk out of sync at {pfx}.nnet.{idx} "
        f"(preact={preact})")
    convs.append(_lip_conv(sd, f"{pfx}.nnet.{idx}"))
  return {"nnet": convs}


def _stack(trees):
  """Stack a list of structurally-identical param trees leaf-wise (the
  ScannedIResBlocks layout)."""
  import jax

  return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def resflow_params_from_torch(state_dict, config,
                              prefix: str = "generator.flow") -> List:
  """Reference wolf `ResidualFlow` (`wolf flows/resflow/resflow_.py:20-335`)
  -> the params list of `indm_tpu.flows.resflow.ResidualFlow` (per-scale
  SequentialFlow param lists; homogeneous block runs stacked for the
  `lax.scan` layout of `build_stacked_iresblocks`)."""
  sd = strip_module_prefix(state_dict)
  n_blocks = [int(b) for b in config.flow.nblocks.split("-")]
  if config.flow.actnorm:
    raise NotImplementedError(
        "flow.actnorm=True checkpoints are not supported by the converter "
        "(no published INDM checkpoint uses them)")
  hw = config.data.image_size // (2 if config.flow.squeeze else 1)
  n_scale_max = 0
  h = hw
  while h >= 4:
    n_scale_max += 1
    h //= 2
  n_scale = min(len(n_blocks), n_scale_max)

  root = f"{prefix}.transforms" if prefix else "transforms"
  params = []
  for s in range(n_scale):
    base = f"{root}.{s}.chain"
    layers = []
    first = s == 0  # first_resblock=True in the INDM instantiation
    n_special = 1 if first else 0
    if n_special:
      layers.append(_iresblock(sd, f"{base}.0", preact=False))
    rest = n_blocks[s] - n_special
    if rest == 1:
      layers.append(_iresblock(sd, f"{base}.{n_special}", preact=True))
    elif rest > 1:
      layers.append(_stack([
          _iresblock(sd, f"{base}.{b}", preact=True)
          for b in range(n_special, n_blocks[s])]))
    if s < n_scale - 1:
      layers.append({})  # SqueezeLayer (parameterless)
    params.append(layers)

  # guard against silently-skipped reference layers (extra scales, actnorm
  # interleaves, chain entries beyond n_blocks)
  for k in sd:
    if not k.startswith(f"{root}."):
      continue
    parts = k[len(root) + 1:].split(".")
    s, b = int(parts[0]), int(parts[2])
    assert s < n_scale and b < n_blocks[s], f"unexpected reference layer {k}"
  return params


# ---------------------------------------------------------------------------
# discriminator (gaussian: ResNet-BN encoder + weight-norm fc + flow prior)
# ---------------------------------------------------------------------------


def _dense_wn(sd, pfx):
  """torch LinearWeightNorm (`wolf nnet/weight_norm.py`) ->
  DenseWeightNorm {v [in,out], g [out], b}."""
  return {"v": _t(sd[f"{pfx}.weight_v"]).T,
          "g": _t(sd[f"{pfx}.weight_g"]).reshape(-1),
          "b": _t(sd[f"{pfx}.bias"])}


def _dense(sd, pfx):
  return {"kernel": _t(sd[f"{pfx}.weight"]).T, "bias": _t(sd[f"{pfx}.bias"])}


def _bn(sd, pfx):
  return ({"scale": _t(sd[f"{pfx}.weight"]), "bias": _t(sd[f"{pfx}.bias"])},
          {"mean": _t(sd[f"{pfx}.running_mean"]),
           "var": _t(sd[f"{pfx}.running_var"])})


def _resnet_block_bn(sd, pfx):
  """`wolf nnet/resnets/resnet_batchnorm.py` ResNetBlock ->
  (params, batch_stats) of `indm_tpu.flows.wolf.ResNetBlockBN`."""
  p, bs = {}, {}
  p["Conv_0"] = {"kernel": _t(sd[f"{pfx}.conv1.weight"]).transpose(2, 3, 1, 0)}
  p["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{pfx}.bn1")
  p["Conv_1"] = {"kernel": _t(sd[f"{pfx}.conv2.weight"]).transpose(2, 3, 1, 0)}
  p["BatchNorm_1"], bs["BatchNorm_1"] = _bn(sd, f"{pfx}.bn2")
  if f"{pfx}.downsample.0.weight" in sd:
    p["Conv_2"] = {
        "kernel": _t(sd[f"{pfx}.downsample.0.weight"]).transpose(2, 3, 1, 0)}
    p["BatchNorm_2"], bs["BatchNorm_2"] = _bn(sd, f"{pfx}.downsample.1")
  return p, bs


def _nice1d(sd, pfx):
  """`wolf flows/couplings/coupling.py` NICE (MLP block) -> NICE1d params."""
  net = {"Dense_0": _dense(sd, f"{pfx}.net.fc1"),
         "Dense_1": _dense(sd, f"{pfx}.net.fc2"),
         "DenseWeightNorm_0": _dense_wn(sd, f"{pfx}.net.fc3.linear")}
  return {"net": net}


def _actnorm1d(sd, pfx):
  return {"log_scale": _t(sd[f"{pfx}.log_scale"]),
          "bias": _t(sd[f"{pfx}.bias"])}


def _prior_step(sd, pfx):
  unit = {"actnorm": _actnorm1d(sd, f"{pfx}.unit.actnorm")}
  for name in ("coupling1_up", "coupling1_dn", "coupling2_up",
               "coupling2_dn"):
    unit[name] = _nice1d(sd, f"{pfx}.unit.{name}")
  return {"actnorm": _actnorm1d(sd, f"{pfx}.actnorm"),
          "linear": {"w": _t(sd[f"{pfx}.linear.weight"])},
          "unit": unit}


def gaussian_disc_params_from_torch(state_dict, wolf_params,
                                    prefix: str = "discriminator"
                                    ) -> Tuple[Dict, Dict]:
  """Reference `GaussianDiscriminator`
  (`wolf modules/discriminators/gaussian.py:14-100` + global BN encoder +
  FlowPrior) -> (params, batch_stats) for
  `indm_tpu.flows.wolf.GaussianDiscriminator`."""
  sd = strip_module_prefix(state_dict)
  d = wolf_params["discriminator"]
  enc = d["encoder"]
  if enc["type"] != "global_resnet_bn":
    raise NotImplementedError(
        f"converter supports the published global_resnet_bn encoder only, "
        f"got {enc['type']!r}")

  params: Dict = {"encoder": {}}
  stats: Dict = {"encoder": {}}
  # two blocks per level, strides [1, 2] (`wolf modules/encoders/
  # global_encoder.py:12-44` builds [ResNetBlock(stride=1),
  # ResNetBlock(stride=2)] per level as resnet{level}.main.{0,1})
  for level in range(int(enc["levels"])):
    for j in range(2):
      p, bs = _resnet_block_bn(sd, f"{prefix}.encoder.net.resnet{level}.main.{j}")
      name = f"ResNetBlockBN_{2 * level + j}"
      params["encoder"][name] = p
      stats["encoder"][name] = bs
  params["encoder"]["Conv_0"] = {
      "kernel": _t(sd[f"{prefix}.encoder.net.top.weight"]).transpose(
          2, 3, 1, 0),
      "bias": _t(sd[f"{prefix}.encoder.net.top.bias"])}
  fc = _dense_wn(sd, f"{prefix}.fc.linear")
  # The torch encoder flattens NCHW (c, h, w); ours flattens NHWC
  # (h, w, c). Permute the fc's input dimension so both consume their own
  # flatten order identically. (h, w, c) index -> torch (c, h, w) index.
  c_out = int(enc["out_planes"])
  hw = int(round((fc["v"].shape[0] / c_out) ** 0.5))
  assert c_out * hw * hw == fc["v"].shape[0], (c_out, hw, fc["v"].shape)
  idx = np.arange(fc["v"].shape[0]).reshape(c_out, hw, hw)  # torch order
  idx = idx.transpose(1, 2, 0).reshape(-1)                  # ours order
  fc["v"] = fc["v"][idx]
  params["fc"] = fc

  prior = d["prior"]
  if prior["type"] == "flow":
    params["prior"] = {}
    for i in range(int(prior["num_steps"])):
      params["prior"][f"steps_{i}"] = _prior_step(
          sd, f"{prefix}.prior.flow.steps.{i}")
  return params, stats


def wolf_state_from_torch(state_dict, config, wolf_params
                          ) -> Tuple[Dict, Dict]:
  """Full WolfCore state_dict -> (params, buffers) for the FlowModel
  pytrees ({'resflow': ..., 'disc': ...}, {'batch_stats': ...})."""
  gen_type = wolf_params["generator"]["flow"].get("type", "resflow")
  if gen_type != "resflow":
    raise NotImplementedError(
        f"converter supports the published resflow generator only, got "
        f"{gen_type!r}")
  params = {"resflow": resflow_params_from_torch(state_dict, config)}
  buffers: Dict = {}
  disc_type = wolf_params["discriminator"]["type"]
  if disc_type == "gaussian":
    disc_p, disc_bs = gaussian_disc_params_from_torch(state_dict,
                                                      wolf_params)
    params["disc"] = disc_p
    buffers["batch_stats"] = disc_bs
  elif disc_type != "base":
    raise NotImplementedError(
        f"converter supports gaussian/base discriminators, got "
        f"{disc_type!r}")
  sd = strip_module_prefix(state_dict)
  leftover = [k for k in sd
              if not _is_buffer_key(k)
              and not k.endswith((".geom_p", ".lamb"))
              and not _consumed(k)]
  assert not leftover, f"unconsumed reference keys: {sorted(leftover)[:5]}"
  return params, buffers


def _consumed(k: str) -> bool:
  return k.startswith(("generator.flow.transforms.", "discriminator."))
