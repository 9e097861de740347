"""Flow model construction + the `flow_forward` dispatcher.

Functional re-design of `/root/reference/flow_models/flow_model.py:7-111`:
the single entry point used by losses/sampling/likelihood. Handles the
optional squeeze pre/post (`flow_model.py:9,24`), the identity/resflow/wolf
branches, and (inside `ResidualFlow.fwdpass`) the multi-scale de-interleave
(`flow_model.py:14-22`). DataParallel wrapping is replaced by mesh sharding
of the jitted step (`indm_tpu.parallel`).

Return convention matches the reference:
  * resflow branch returns (z, log_jacob) with log_jacob the TRUE log|det|
    (`flow_model.py:26` returns -neg_log_jacob);
  * wolf branch returns (z, logdet_minus_kl) = fwdpass log|det| - KL
    (`wolf.py:116-128`), which the joint losses negate
    (`losses.py:296-301`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import flax.linen as nn

from indm_tpu.configs.wolf_presets import load_wolf_params
from indm_tpu.flows import wolf as wolf_lib
from indm_tpu.flows.resflow import ResidualFlow, squeeze_nhwc, unsqueeze_nhwc


class FlowModel:
  """Static flow architecture; parameters live in an external pytree:
     {'resflow': ..., 'disc': ...} plus buffers {'batch_stats': ...}."""

  def __init__(self, config):
    self.kind = config.flow.model
    self.squeeze = bool(config.flow.squeeze)
    self.config = config
    self.resflow = None
    self.disc = None
    if self.kind == "identity":
      return

    img = config.data.image_size
    ch = config.data.num_channels
    if self.squeeze:
      img, ch = img // 2, ch * 4
    n_blocks = tuple(int(b) for b in config.flow.nblocks.split("-"))

    self.gen_kind = "resflow"
    self.gen_module = None
    self.disc_is_module = False
    if self.kind == "resflow":
      cond_dim = None
    elif self.kind == "wolf":
      self.wolf_params = load_wolf_params(config.flow.model_config)
      self.disc = wolf_lib.make_discriminator(self.wolf_params)
      self.disc_is_module = isinstance(self.disc, nn.Module)
      # conditioning width = the discriminator's latent dim (h feeds the
      # generator's cond projection, `wolf generator.py:88-109`); the base
      # discriminator yields z=None -> unconditional generator
      cond_dim = getattr(self.disc, "dim", None)
      self.gen_kind = self.wolf_params["generator"]["flow"].get("type",
                                                                "resflow")
    else:
      raise NotImplementedError(self.kind)
    self.cond_dim = cond_dim

    if self.gen_kind == "resflow":
      # INDM instantiation (`flow_models/flow_model.py:93-100`,
      # `wolf generator.py:101-106`): vnorms='ffff', coeff 0.98 default,
      # poisson log-det, act from config.
      self.resflow = ResidualFlow(
          image_hw=img, in_ch=ch, n_blocks=n_blocks,
          intermediate_dim=config.flow.intermediate_dim,
          coeff=0.98, vnorms="ffff", kernels="3-1-3",
          activation_fn=config.flow.act_fn, n_exact_terms=2,
          n_dist="poisson", cond_dim=cond_dim, preact=True,
          first_resblock=True, actnorm=config.flow.actnorm,
          unroll_terms=config.flow.get("logdet_unroll", 0) or None,
          chain_bf16=bool(config.flow.get("logdet_bf16", False)),
          chain_pallas=bool(config.flow.get("logdet_pallas", False)),
          mixed_precision=bool(config.flow.get("mixed_precision", False)),
          save_preacts=bool(config.flow.get("remat_save_preacts", False)),
          fused_block=bool(config.flow.get("fused_block", False)))
    else:
      # glow / macow generators built from the wolf JSON
      # (`wolf generator.py:106-108`, Flow.by_name registry).
      from indm_tpu.flows import wolf_glow, wolf_macow  # noqa: F401
      gp = dict(self.wolf_params["generator"]["flow"])
      gp.pop("type", None)
      gp.pop("inverse", None)         # direction bookkeeping, handled here
      ct = gp.pop("coupling_type", "conv")
      assert ct == "conv", f"coupling_type {ct} not supported"
      if "num_groups" in gp and gp.get("normalize") != "group_norm":
        gp.pop("num_groups")
      self.gen_module = wolf_glow.flow_by_name(self.gen_kind).from_params(gp)

  def init(self, rng) -> Tuple[Dict, Dict]:
    """Returns (params, buffers)."""
    if self.kind == "identity":
      return {}, {}
    r1, r2, r3 = jax.random.split(rng, 3)
    img = self.config.data.image_size
    ch = self.config.data.num_channels
    if self.squeeze:
      img, ch = img // 2, ch * 4
    if self.gen_kind == "resflow":
      params = {"resflow": self.resflow.init(r1)}
    else:
      # glow/macow layers use the wolf DATA-DEPENDENT init protocol
      # (`wolf.py:36-39`, `weight_norm.py:61-74`): trace init with
      # unit-scale random inputs (not zeros) so every actnorm/weight-norm
      # layer standardizes to sane statistics — required for deep stacks
      # to be finite at step 0
      r1a, r1b, r1c = jax.random.split(r1, 3)
      x = jax.random.normal(r1b, (8, img, img, ch))
      h = (jax.random.normal(r1c, (8, self.gen_module.h_channels))
           if self.gen_module.h_channels else None)
      gen_vars = self.gen_module.init(r1a, x, h=h, train=False)
      params = {"gen": gen_vars["params"]}
    buffers = {}
    if self.disc is not None and self.disc_is_module:
      img = self.config.data.image_size
      ch = self.config.data.num_channels
      if self.squeeze:
        img, ch = img // 2, ch * 4
      x = jnp.zeros((2, img, img, ch))
      kw = {}
      if isinstance(self.disc, wolf_lib.GaussianDiscriminator):
        pass
      else:  # categorical needs labels to trace its embed path
        kw["y"] = jnp.zeros((2,), jnp.int32)
      # init through sampling_and_KL so the flow prior's params are created
      variables = self.disc.init({"params": r2, "sample": r3}, x,
                                 train=False,
                                 method=self.disc.sampling_and_KL, **kw)
      params["disc"] = variables["params"]
      buffers["batch_stats"] = variables.get("batch_stats", {})
    return params, buffers

  # -- discriminator plumbing ------------------------------------------------

  def _disc_vars(self, params, buffers):
    return {"params": params["disc"],
            "batch_stats": buffers.get("batch_stats", {})}

  def sampling_and_kl(self, params, buffers, x, rng, train, y=None):
    if not self.disc_is_module:  # 'base': z=None, KL=0
      z, kl = self.disc.sampling_and_KL(x, y=y, train=train)
      return z, kl, buffers
    kw = {} if y is None else {"y": y}
    out = self.disc.apply(
        self._disc_vars(params, buffers), x, train=train,
        method=self.disc.sampling_and_KL,
        rngs={"sample": rng},
        mutable=["batch_stats"] if train else False, **kw)
    if train:
      (z, kl), mutated = out
      return z, kl, {"batch_stats": mutated.get("batch_stats", {})}
    z, kl = out
    return z, kl, buffers

  def sample_prior(self, params, buffers, n, rng):
    if not self.disc_is_module:
      return self.disc.sample_from_prior(n)
    return self.disc.apply(self._disc_vars(params, buffers), n,
                           method=self.disc.sample_from_prior,
                           rngs={"sample": rng})


def create_flow_model(config) -> Optional[FlowModel]:
  """`flow_models/flow_model.py:86-110` (+ WolfCore.from_params)."""
  if config.flow.model == "identity":
    return None
  return FlowModel(config)


def flow_forward(config, flow_model: FlowModel, params, buffers, x,
                 rng=None, reverse: bool = False, train: bool = False,
                 eval_logdet: bool = True, y=None):
  """Single flow entry (`flow_model.py:7-69`).

  Forward: returns (z, logdet, new_buffers) — `logdet` per the reference
  convention above (or None when eval_logdet=False). `y` (class labels)
  feeds the categorical discriminator's embedding
  (`discriminators/categorical.py`); None for unconditional presets.
  Reverse: returns (x, None, buffers).
  """
  if flow_model is None or flow_model.kind == "identity":
    zeros = jnp.zeros((x.shape[0],), x.dtype)
    return x, zeros, buffers

  if rng is None:
    rng = jax.random.PRNGKey(0)
  rng_h, rng_f = jax.random.split(rng)

  if flow_model.squeeze:
    x = squeeze_nhwc(x, 2)

  if flow_model.kind == "resflow":
    if not reverse:
      z, neg_log_jacob = flow_model.resflow.fwdpass(
          params["resflow"], x, rng=rng_f, train=train,
          eval_logdet=eval_logdet)
      logdet = -neg_log_jacob if eval_logdet else None
    else:
      z, _ = flow_model.resflow.bwdpass(params["resflow"], x, rng=rng_f)
      logdet = None
    new_buffers = buffers
  elif flow_model.kind == "wolf":
    if not reverse:
      h, kl, new_buffers = flow_model.sampling_and_kl(params, buffers, x,
                                                      rng_h, train, y=y)
      if flow_model.gen_kind == "resflow":
        z, logpx = flow_model.resflow.fwdpass(
            params["resflow"], x, h=h, rng=rng_f, train=train,
            eval_logdet=eval_logdet)
        # reference: loss = -logdet_fwdpass - kl; flow_forward returns it
        # as 'logdet_kl' (`wolf.py:126-128`, `flow_model.py:58`); fwdpass's
        # logpx == -sum(logdetgrad), so this equals +log|det| - KL; the
        # joint loss then uses -(this) (`losses.py:296-301`).
        logdet = (-logpx - kl) if eval_logdet else None
      else:
        # glow/macow generators are built with inverse=True in the JSON:
        # encoding runs the module's reverse pass.
        h_in = h if flow_model.gen_module.h_channels else None
        z, ld = flow_model.gen_module.apply({"params": params["gen"]}, x,
                                            h=h_in, reverse=True,
                                            train=train)
        logdet = (ld - kl) if eval_logdet else None
    else:
      h = flow_model.sample_prior(params, buffers, x.shape[0], rng_h)
      if flow_model.gen_kind == "resflow":
        z, _ = flow_model.resflow.bwdpass(params["resflow"], x, h=h,
                                          rng=rng_f)
      else:
        h_in = h if flow_model.gen_module.h_channels else None
        z, _ = flow_model.gen_module.apply({"params": params["gen"]}, x,
                                           h=h_in, reverse=False,
                                           train=train)
      logdet = None
      new_buffers = buffers
  else:
    raise NotImplementedError(flow_model.kind)

  if flow_model.squeeze:
    z = unsqueeze_nhwc(z, 2)
  return z, logdet, new_buffers


def get_lipschitz_constants(flow_model: FlowModel, params):
  """Per-layer Lipschitz scales for monitoring
  (`flow_models/resflow/utils.py:134-143`): the operator-norm bound of every
  Lipschitz conv in the resflow generator, flattened in layer order.
  Scanned stacks report the worst scale across their stacked blocks."""
  if flow_model is None or flow_model.resflow is None:
    return []
  out = []

  def nnet_scales(nnet, p):
    return [c.lipschitz_scale(cp) for c, cp in zip(nnet.convs, p)
            if hasattr(c, "lipschitz_scale")]

  def walk(layer, p):
    if hasattr(layer, "block"):     # ScannedIResBlocks (stacked params)
      per_block = jax.vmap(
          lambda q: jnp.stack(nnet_scales(layer.block.nnet, q["nnet"])))(p)
      out.extend(jnp.max(per_block, axis=0))
    elif hasattr(layer, "nnet"):    # single IResBlock
      out.extend(nnet_scales(layer.nnet, p["nnet"]))
    elif hasattr(layer, "layers"):  # SequentialFlow
      for l, lp in zip(layer.layers, p):
        walk(l, lp)

  for t, tp in zip(flow_model.resflow.transforms, params["resflow"]):
    walk(t, tp)
  return [float(v) for v in out]


def update_lipschitz(flow_model: FlowModel, params):
  """Post-step Lipschitz projection (`flow_models/resflow/utils.py:126-132`).

  With INDM's vnorms='ffff' every Lipschitz layer is a Lop (operator-norm)
  layer whose constraint is enforced deterministically inside the forward —
  there is no power-iteration state and the projection is the identity.
  SpectralNorm/InducedNorm layers carry u/v state and get a converged
  power-iteration pass via `.converge`.
  """
  if flow_model is None or flow_model.resflow is None:
    return params
  new = dict(params)
  new["resflow"] = flow_model.resflow.converge(params["resflow"])
  return new
