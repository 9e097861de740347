"""Parity tests for the flow-side checkpoint converter
(`indm_tpu/flows/convert.py`): build the ACTUAL reference WolfCore
(`/root/reference/flow_models/wolf/wolf.py:18-145`) on CPU torch, convert
its state_dict, and assert the deterministic pipeline pieces agree through
the jax modules — encoder posterior (mu, logvar), prior KL with fixed
reparameterization noise, the full 2x16-block conditional resflow
generator map z(x, h), and (tiny geometry) the exact log|det| via autograd
Jacobians on both sides. Also pins the EMA shadow ordering rule against
the live `model.parameters()` order."""

import json
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))

from test_reference_parity import REF, ref_module, t2n  # noqa: E402

WOLF_JSON = os.path.join(
    REF, "flow_models/wolf/wolf_configs/cifar10/glow/resflow-gaussian-uni.json")


def _install_wolf_stubs():
  """The reference wolf tree imports torchvision (data loaders), overrides
  (decorator) and torch._six (inf) — none present in this image; stub the
  import surface (`SURVEY.md` §7.4 stubbing) before `ref_module`."""
  if "overrides" not in sys.modules:
    ov = types.ModuleType("overrides")
    ov.overrides = lambda f: f
    sys.modules["overrides"] = ov
  if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.transforms"] = tv.transforms
  if "torch._six" not in sys.modules:
    six = types.ModuleType("torch._six")
    six.inf = math.inf
    sys.modules["torch._six"] = six


def _ref_wolf():
  _install_wolf_stubs()
  return ref_module("flow_models.wolf")


@pytest.fixture(scope="module")
def indm_pair():
  """(reference WolfCore, converted jax FlowModel/params/buffers) at the
  published INDM CIFAR-10 geometry."""
  from indm_tpu.configs import get_config
  from indm_tpu.flows import convert as fconvert
  from indm_tpu.flows.flow_model import create_flow_model

  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.training.batch_size = 2
  wolf = _ref_wolf()
  wolf_params = json.load(open(WOLF_JSON))
  cfg.device = torch.device("cpu")
  torch.manual_seed(0)
  core = wolf.WolfCore.from_params(json.loads(json.dumps(wolf_params)), cfg)
  core.eval()
  sd = core.state_dict()

  params, buffers = fconvert.wolf_state_from_torch(
      sd, cfg, json.load(open(WOLF_JSON)))
  fm = create_flow_model(cfg)
  return core, fm, params, buffers


@pytest.mark.slow
def test_encoder_posterior_parity(indm_pair):
  core, fm, params, buffers = indm_pair
  rng = np.random.RandomState(0)
  x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
  with torch.no_grad():
    mu_t, logvar_t = core.discriminator(torch.from_numpy(x))
  x_j = np.transpose(x, (0, 2, 3, 1))
  mu_j, logvar_j = fm.disc.apply(
      {"params": params["disc"], "batch_stats": buffers["batch_stats"]},
      x_j, train=False)
  np.testing.assert_allclose(np.asarray(mu_j), t2n(mu_t), atol=2e-4)
  np.testing.assert_allclose(np.asarray(logvar_j), t2n(logvar_t), atol=2e-4)


@pytest.mark.slow
def test_prior_kl_parity(indm_pair):
  core, fm, params, buffers = indm_pair
  rng = np.random.RandomState(1)
  b, ns, dim = 2, 1, 64
  z = rng.normal(size=(b, ns, dim)).astype(np.float32)
  eps = rng.normal(size=(b, ns, dim)).astype(np.float32)
  mu = rng.normal(size=(b, dim)).astype(np.float32)
  logvar = rng.normal(scale=0.3, size=(b, dim)).astype(np.float32)
  with torch.no_grad():
    kl_t = core.discriminator.prior.calcKL(
        torch.from_numpy(z), torch.from_numpy(eps), torch.from_numpy(mu),
        torch.from_numpy(logvar))
  kl_j = fm.disc.apply(
      {"params": params["disc"], "batch_stats": buffers["batch_stats"]},
      z, eps, mu, logvar, method=fm.disc.calc_kl)
  np.testing.assert_allclose(np.asarray(kl_j), t2n(kl_t), rtol=1e-5,
                             atol=1e-3)


@pytest.mark.slow
def test_generator_forward_parity(indm_pair):
  """z(x, h) through the full converted 16-16 conditional resflow
  (deterministic; the stochastic piece is only the log-det estimator)."""
  import jax

  core, fm, params, buffers = indm_pair
  rng = np.random.RandomState(2)
  x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
  h = rng.normal(size=(2, 64)).astype(np.float32)
  with torch.no_grad():
    z_t = core.generator.flow.fwdpass(torch.from_numpy(x),
                                      torch.from_numpy(h),
                                      eval_logdet=False)
  z_j, _ = fm.resflow.fwdpass(params["resflow"],
                              np.transpose(x, (0, 2, 3, 1)), h=h,
                              rng=jax.random.PRNGKey(0), train=False,
                              eval_logdet=False)
  np.testing.assert_allclose(np.transpose(np.asarray(z_j), (0, 3, 1, 2)),
                             t2n(z_t), atol=5e-4)


@pytest.mark.slow
def test_generator_inverse_parity(indm_pair):
  """bwdpass (fixed-point inverse) through converted weights: x(z, h)."""
  import jax

  core, fm, params, buffers = indm_pair
  rng = np.random.RandomState(3)
  z = rng.normal(scale=0.5, size=(2, 3, 32, 32)).astype(np.float32)
  h = rng.normal(size=(2, 64)).astype(np.float32)
  with torch.no_grad():
    x_t, _ = core.generator.flow.bwdpass(torch.from_numpy(z),
                                         torch.from_numpy(h))
  x_j, _ = fm.resflow.bwdpass(params["resflow"],
                              np.transpose(z, (0, 2, 3, 1)), h=h,
                              rng=jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.transpose(np.asarray(x_j), (0, 3, 1, 2)),
                             t2n(x_t), atol=2e-3)


def test_ema_shadow_order_matches_named_parameters(indm_pair):
  """The converter's static parameter/buffer split must reproduce the live
  `model.parameters()` order the reference EMA shadow list follows
  (`/root/reference/models/ema.py:28-29`)."""
  from indm_tpu.flows import convert as fconvert

  core, _, _, _ = indm_pair
  sd = core.state_dict()
  expected = [n for n, _ in core.named_parameters()]
  assert fconvert.flow_param_keys(sd) == expected


def test_ema_state_dict_substitution(indm_pair):
  from indm_tpu.flows import convert as fconvert

  core, _, _, _ = indm_pair
  sd = core.state_dict()
  shadow = [p.detach().clone() * 0 + i
            for i, (_, p) in enumerate(core.named_parameters())]
  ema_sd = fconvert.flow_ema_state_dict_from_torch(
      {"model": sd, "ema": {"shadow_params": shadow}})
  keys = fconvert.flow_param_keys(sd)
  assert float(ema_sd[keys[5]].flatten()[0]) == 5.0
  # buffers untouched
  bkey = next(k for k in sd if k.endswith("running_mean"))
  assert np.array_equal(t2n(ema_sd[bkey]), t2n(sd[bkey]))


def test_flow_checkpoint_conversion_roundtrip(tmp_path):
  """Reference `flow_checkpoint.pth` ({optimizer, model, ema, step},
  `utils.py:114-145`) -> scripts/convert_flow_checkpoint.py -> msgpack ->
  `run_lib.load_flow_model`-style restore: params, buffers (BN running
  stats), EMA (rebuilt from the bare shadow_params list incl. the inert
  geom_p/lamb entries) and step all survive."""
  import jax
  import jax.numpy as jnp

  from indm_tpu import checkpoint as ckpt_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.flows import convert as fconvert
  from indm_tpu.flows.flow_model import create_flow_model

  tiny_json = {
      "generator": {"flow": {"type": "resflow"}},
      "discriminator": {
          "type": "gaussian",
          "encoder": {"type": "global_resnet_bn", "levels": 2,
                      "in_planes": 3, "hidden_planes": [4, 4],
                      "out_planes": 4, "activation": "elu"},
          # dim must stay 64: the reference hardcodes h_channels=64 in its
          # conditional convs (`wolf resflow layers/base/lipschitz.py:415`)
          "in_dim": 16, "dim": 64,
          "prior": {"type": "flow", "num_steps": 1, "in_features": 64,
                    "hidden_features": 16, "activation": "elu",
                    "transform": "affine", "alpha": 1.0,
                    "coupling_type": "mlp"},
      },
      "dequantizer": {"type": "uniform"},
  }
  json_path = tmp_path / "tiny.json"
  json_path.write_text(json.dumps(tiny_json))

  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.data.image_size = 8
  cfg.flow.nblocks = "2-2"
  cfg.flow.intermediate_dim = 16
  cfg.flow.model_config = str(json_path)
  cfg.training.batch_size = 2
  cfg.device = torch.device("cpu")

  wolf = _ref_wolf()
  torch.manual_seed(2)
  core = wolf.WolfCore.from_params(json.loads(json_path.read_text()), cfg)
  # perturb BN running stats so buffer transport is detectable
  with torch.no_grad():
    for name, buf in core.named_buffers():
      if name.endswith("running_mean"):
        buf.add_(0.25)
  sd = core.state_dict()
  shadow = [p.detach().clone() + 1.0 for _, p in core.named_parameters()]
  ckpt = {"model": {f"module.{k}": v for k, v in sd.items()},
          "ema": {"decay": 0.999, "num_updates": 77,
                  "shadow_params": shadow},
          "optimizer": {}, "step": 77}
  pth = tmp_path / "flow_checkpoint.pth"
  torch.save(ckpt, pth)

  import importlib.util
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  spec = importlib.util.spec_from_file_location(
      "convert_flow_checkpoint",
      os.path.join(root, "scripts", "convert_flow_checkpoint.py"))
  cli = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(cli)
  import indm_tpu.configs as cfgs
  out = tmp_path / "flow_converted.msgpack"
  orig_get_config, cfgs.get_config = cfgs.get_config, lambda name: cfg
  orig_argv = sys.argv
  try:
    sys.argv = ["convert_flow_checkpoint.py", str(pth), "tiny", str(out)]
    cli.main()
  finally:
    cfgs.get_config = orig_get_config
    sys.argv = orig_argv
  assert out.exists()

  fm = create_flow_model(cfg)
  init_p, init_b = fm.init(jax.random.PRNGKey(5))
  opt = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
  fresh = state_lib.init_train_state(cfg, init_p, init_b, opt,
                                     jax.random.PRNGKey(6))
  restored = ckpt_lib.restore_checkpoint(cfg, str(out), fresh,
                                         keep_optimizer=True)
  assert int(restored.step) == 77
  # EMA = params + 1 on every leaf: the shadow list (which also covers the
  # dropped geom_p/lamb entries) was zipped in the right order
  diffs = jax.tree_util.tree_map(lambda e, p: np.max(np.abs(e - p - 1.0)),
                                 restored.ema_params, restored.params)
  assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6
  # BN running means carried the +0.25 perturbation
  means = [np.asarray(v) for k, v in jax.tree_util.tree_flatten_with_path(
      restored.buffers)[0] if "mean" in jax.tree_util.keystr(k)]
  assert means and all(np.allclose(m, 0.25) for m in means)
  # restored state drives a flow_forward with finite outputs
  from indm_tpu.flows.flow_model import flow_forward
  x = jnp.asarray(np.random.RandomState(0).uniform(
      -1, 1, (2, 8, 8, 3)).astype(np.float32))
  z, logdet, _ = flow_forward(cfg, fm, restored.params, restored.buffers,
                              x, rng=jax.random.PRNGKey(0), train=False)
  assert np.isfinite(np.asarray(z)).all()
  assert np.isfinite(np.asarray(logdet)).all()


@pytest.mark.slow
def test_exact_logdet_parity_tiny():
  """Brute-force log|det| parity through converted weights on a tiny
  geometry (8x8, 2-2 blocks): autograd Jacobian + slogdet on both sides.
  This checks the conversion preserves the density, not just the map."""
  import jax
  import jax.numpy as jnp
  import ml_collections

  from indm_tpu.configs import get_config
  from indm_tpu.flows import convert as fconvert
  from indm_tpu.flows.resflow import ResidualFlow

  _install_wolf_stubs()
  ref_resflow = ref_module("flow_models.wolf.flows.resflow")

  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.data.image_size = 8
  cfg.flow.nblocks = "2-2"
  cfg.flow.intermediate_dim = 16
  cfg.training.batch_size = 1
  torch.manual_seed(1)
  flow_t = ref_resflow.ResidualFlow(
      cfg, (1, 3, 8, 8), n_blocks=[2, 2], intermediate_dim=16,
      vnorms="ffff", actnorm=False, grad_in_forward=False,
      activation_fn="sin")
  flow_t.eval()
  params = fconvert.resflow_params_from_torch(flow_t.state_dict(), cfg,
                                              prefix="")
  flow_j = ResidualFlow(image_hw=8, in_ch=3, n_blocks=(2, 2),
                        intermediate_dim=16, coeff=0.98, vnorms="ffff",
                        activation_fn="sin", cond_dim=64)

  rng = np.random.RandomState(4)
  x = rng.uniform(-1, 1, (1, 3, 8, 8)).astype(np.float32)
  h = rng.normal(size=(1, 64)).astype(np.float32)

  h_t = torch.from_numpy(h)

  def f_torch(xf):
    z = flow_t.fwdpass(xf.reshape(1, 3, 8, 8), h_t, eval_logdet=False)
    return z.reshape(-1)

  jac_t = torch.autograd.functional.jacobian(
      f_torch, torch.from_numpy(x.reshape(-1)))
  ld_t = torch.linalg.slogdet(jac_t)[1].item()

  def f_jax(xf):
    z, _ = flow_j.fwdpass(params, xf.reshape(1, 8, 8, 3), h=jnp.asarray(h),
                          rng=jax.random.PRNGKey(0), train=False,
                          eval_logdet=False)
    return z.reshape(-1)

  x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)).reshape(-1))
  jac_j = jax.jacfwd(f_jax)(x_j)
  ld_j = float(jnp.linalg.slogdet(jac_j)[1])
  assert abs(ld_t - ld_j) < 1e-3, (ld_t, ld_j)

  # and the forward map itself agrees pointwise in image layout
  z_t = t2n(f_torch(torch.from_numpy(x.reshape(-1)))).reshape(1, 3, 8, 8)
  z_j = np.asarray(f_jax(x_j)).reshape(1, 8, 8, 3)
  np.testing.assert_allclose(np.transpose(z_j, (0, 3, 1, 2)), z_t,
                             atol=1e-4)
