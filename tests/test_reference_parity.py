"""Torch<->JAX golden parity tests against the ACTUAL reference modules.

Runs the reference PyTorch implementations from /root/reference on CPU (the
CUDA `op` extension is replaced by the reference's own pure-torch
`upfirdn2d_native`, extracted from `op/upfirdn2d.py:159-200` without importing
the CUDA JIT) and asserts our JAX implementations reproduce them:

  * upfirdn2d            vs `op/upfirdn2d.py:159-200` (upfirdn2d_native)
  * VP/subVP/VE/GVP SDEs vs `sde_lib.py:123-466` closed forms
  * t importance sampler vs `sde_lib.py:197-206,333-341` inverse CDFs
  * iResBlock logdet     vs `flow_models/resflow/layers/iresblock.py:85-94`
  * spectral-norm sigma  vs `flow_models/resflow/layers/base/lipschitz.py`

Skips cleanly when torch or /root/reference is unavailable.
"""

import ast
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
    # torch-vs-jax numerical parity reruns whole reference modules on CPU;
    # multi-minute. The fast subset covers the same code via the jnp oracles.
    pytest.mark.slow,
]


# ---------------------------------------------------------------------------
# Reference loading (CPU-only: never trigger the CUDA cpp_extension JIT)
# ---------------------------------------------------------------------------

_cache = {}


def _extract_function(path, name, namespace):
  """exec a single function def out of a source file (skips module-level
  side effects like `torch.utils.cpp_extension.load`)."""
  with open(path) as f:
    tree = ast.parse(f.read())
  for node in tree.body:
    if isinstance(node, ast.FunctionDef) and node.name == name:
      mod = ast.Module(body=[node], type_ignores=[])
      code = compile(mod, path, "exec")
      exec(code, namespace)
      return namespace[name]
  raise AssertionError(f"{name} not found in {path}")


def ref_upfirdn2d_native():
  if "upfirdn2d_native" not in _cache:
    ns = {"torch": torch, "F": torch.nn.functional}
    _cache["upfirdn2d_native"] = _extract_function(
        os.path.join(REF, "op", "upfirdn2d.py"), "upfirdn2d_native", ns)
  return _cache["upfirdn2d_native"]


def _install_op_stub():
  """Replace the reference's CUDA `op` package with its own CPU semantics so
  `flow_models` / `models` import cleanly (SURVEY §7.4 stubbing)."""
  if "op" in sys.modules and getattr(sys.modules["op"], "_parity_stub", False):
    return
  native = ref_upfirdn2d_native()

  def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
    return native(input, kernel, up, up, down, down,
                  pad[0], pad[1], pad[0], pad[1])

  def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
    rest_dim = [1] * (input.ndim - bias.ndim - 1)
    return torch.nn.functional.leaky_relu(
        input + bias.view(1, bias.shape[0], *rest_dim),
        negative_slope=negative_slope) * scale

  class FusedLeakyReLU(torch.nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
      super().__init__()
      self.bias = torch.nn.Parameter(torch.zeros(channel))
      self.negative_slope, self.scale = negative_slope, scale

    def forward(self, input):
      return fused_leaky_relu(input, self.bias, self.negative_slope,
                              self.scale)

  stub = types.ModuleType("op")
  stub.upfirdn2d = upfirdn2d
  stub.fused_leaky_relu = fused_leaky_relu
  stub.FusedLeakyReLU = FusedLeakyReLU
  stub._parity_stub = True
  sys.modules["op"] = stub


def ref_module(name):
  """Import a reference module by dotted name with /root/reference on the
  path and the CUDA op package stubbed."""
  if name not in _cache:
    _install_op_stub()
    if REF not in sys.path:
      sys.path.insert(0, REF)
    _cache[name] = __import__(name, fromlist=["_"])
  return _cache[name]


def t2n(x):
  return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# upfirdn2d
# ---------------------------------------------------------------------------

UPFIRDN_CASES = [
    # (up, down, pad, kernel_size)
    (1, 1, (1, 1), 3),
    (2, 1, (2, 1), 4),
    (1, 2, (1, 1), 4),
    (2, 2, (2, 2), 3),
    (1, 1, (0, 2), 2),
    (1, 2, (2, 0), 3),
]


@pytest.mark.parametrize("up,down,pad,ksz", UPFIRDN_CASES)
def test_upfirdn2d_vs_reference(up, down, pad, ksz):
  from indm_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_native

  rng = np.random.RandomState(0)
  x = rng.randn(2, 3, 8, 8).astype(np.float32)           # NCHW for torch
  k = rng.randn(ksz, ksz).astype(np.float32)

  native = ref_upfirdn2d_native()
  ref = t2n(native(torch.from_numpy(x), torch.from_numpy(k),
                   up, up, down, down, pad[0], pad[1], pad[0], pad[1]))

  x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
  got = np.asarray(upfirdn2d(x_nhwc, jnp.asarray(k), up=up, down=down,
                             pad=pad)).transpose(0, 3, 1, 2)
  oracle = np.asarray(upfirdn2d_native(
      x_nhwc, jnp.asarray(k), up, up, down, down,
      pad[0], pad[1], pad[0], pad[1])).transpose(0, 3, 1, 2)

  np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(oracle, ref, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_grad_vs_reference():
  """JAX AD's derived VJP must match torch autograd through the native op."""
  from indm_tpu.ops.upfirdn2d import upfirdn2d

  rng = np.random.RandomState(1)
  x = rng.randn(1, 2, 6, 6).astype(np.float32)
  k = rng.randn(3, 3).astype(np.float32)

  native = ref_upfirdn2d_native()
  xt = torch.from_numpy(x).requires_grad_(True)
  out = native(xt, torch.from_numpy(k), 2, 2, 1, 1, 1, 1, 1, 1)
  out.sum().backward()
  ref_grad = t2n(xt.grad)

  f = lambda xx: jnp.sum(upfirdn2d(xx, jnp.asarray(k), up=2, down=1,
                                   pad=(1, 1)))
  got = np.asarray(jax.grad(f)(jnp.asarray(x.transpose(0, 2, 3, 1))))
  np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref_grad,
                             rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# SDE closed forms
# ---------------------------------------------------------------------------

def _sde_pair(kind):
  sde_lib = ref_module("sde_lib")
  import indm_tpu.sde as jsde
  kw = dict(truncation_time=1e-5, N=1000)
  if kind == "vp":
    return sde_lib.VPSDE(**kw), jsde.VPSDE(**kw)
  if kind == "subvp":
    return sde_lib.subVPSDE(**kw), jsde.subVPSDE(**kw)
  if kind == "ve":
    return sde_lib.VESDE(**kw), jsde.VESDE(**kw)
  if kind == "gvp":
    return sde_lib.GeometricVPSDE(**kw), jsde.GeometricVPSDE(**kw)
  raise ValueError(kind)


_T_GRID = np.array([1e-5, 0.01, 0.1, 0.35, 0.5, 0.77, 0.999], np.float32)


@pytest.mark.parametrize("kind", ["vp", "subvp", "ve", "gvp"])
def test_sde_closed_forms_vs_reference(kind):
  ref, mine = _sde_pair(kind)
  rng = np.random.RandomState(2)
  x = rng.randn(len(_T_GRID), 3, 4, 4).astype(np.float32)
  xt, tt = torch.from_numpy(x), torch.from_numpy(_T_GRID)
  xj, tj = jnp.asarray(x), jnp.asarray(_T_GRID)

  # marginal_prob
  mean_r, std_r = ref.marginal_prob(xt, tt)
  mean_j, std_j = mine.marginal_prob(xj, tj)
  np.testing.assert_allclose(np.asarray(mean_j), t2n(mean_r), rtol=2e-5,
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(std_j), t2n(std_r) + 0.0, rtol=2e-5,
                             atol=1e-6)

  # sde drift/diffusion
  dr_r, di_r = ref.sde(xt, tt)
  dr_j, di_j = mine.sde(xj, tj)
  np.testing.assert_allclose(np.asarray(dr_j), t2n(dr_r), rtol=2e-5, atol=1e-6)
  np.testing.assert_allclose(
      np.broadcast_to(np.asarray(di_j), _T_GRID.shape),
      np.broadcast_to(t2n(di_r), _T_GRID.shape), rtol=2e-5, atol=1e-6)

  # prior_logp
  np.testing.assert_allclose(np.asarray(mine.prior_logp(xj)),
                             t2n(ref.prior_logp(xt)), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("kind", ["vp", "ve", "gvp"])
def test_sde_discretize_vs_reference(kind):
  ref, mine = _sde_pair(kind)
  rng = np.random.RandomState(3)
  x = rng.randn(len(_T_GRID), 3, 4, 4).astype(np.float32)
  xt, tt = torch.from_numpy(x), torch.from_numpy(_T_GRID)
  xj, tj = jnp.asarray(x), jnp.asarray(_T_GRID)

  # two-time-point discretization (the PC sampler's path)
  next_t = np.maximum(_T_GRID - 1.0 / 1000.0, 0.0).astype(np.float32)
  f_r, g_r = ref.discretize(xt, tt, torch.from_numpy(next_t))
  f_j, g_j = mine.discretize(xj, tj, jnp.asarray(next_t))
  np.testing.assert_allclose(np.asarray(f_j), t2n(f_r), rtol=2e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(g_j), t2n(g_r), rtol=2e-4, atol=1e-6)

  if kind == "gvp":
    return  # reference raises NotImplementedError for next_t=None
  f_r, g_r = ref.discretize(xt, tt, None)
  f_j, g_j = mine.discretize(xj, tj, None)
  np.testing.assert_allclose(np.asarray(f_j), t2n(f_r), rtol=2e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(g_j), t2n(g_r), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["vp", "ve"])
def test_importance_sampled_time_vs_reference(kind, monkeypatch):
  """Same uniforms through both inverse CDFs -> same t and Z
  (`sde_lib.py:197-206` VP, `:333-341` VE)."""
  ref, mine = _sde_pair(kind)
  u = np.linspace(0.01, 0.99, 16).astype(np.float32)
  t_min = 1e-5

  monkeypatch.setattr(torch, "rand",
                      lambda *a, **k: torch.from_numpy(u.copy()))
  cfg = types.SimpleNamespace(
      training=types.SimpleNamespace(importance_sampling=True))
  t_ref, z_ref = ref.get_diffusion_time(cfg, len(u), "cpu", t_min)

  monkeypatch.setattr(jax.random, "uniform",
                      lambda rng, shape=(), **k: jnp.asarray(u))
  t_j, z_j = mine.get_diffusion_time(jax.random.PRNGKey(0), len(u), t_min,
                                     importance_sampling=True)
  np.testing.assert_allclose(np.asarray(t_j), t2n(t_ref), rtol=1e-4,
                             atol=1e-6)
  np.testing.assert_allclose(float(z_j), float(z_ref), rtol=1e-4)


def test_vp_antiderivative_vs_reference():
  ref, mine = _sde_pair("vp")
  for t in [1e-5, 0.1, 0.5, 1.0]:
    np.testing.assert_allclose(float(mine.antiderivative(t)),
                               float(ref.antiderivative(t)), rtol=1e-5)
  np.testing.assert_allclose(float(mine.normalizing_constant(1e-5)),
                             float(ref.normalizing_constant(1e-5)),
                             rtol=1e-5)


def test_gvp_discrete_tables_match_where_reference_is_finite():
  """Our clamped GVP beta table must agree with the reference everywhere the
  reference's own table is finite (`sde_lib.py:369-377`)."""
  ref, mine = _sde_pair("gvp")
  ref_betas = t2n(ref.discrete_betas)
  mine_betas = np.asarray(mine.discrete_betas)
  finite_valid = np.isfinite(ref_betas) & (ref_betas < 0.999)
  np.testing.assert_allclose(mine_betas[finite_valid],
                             ref_betas[finite_valid], rtol=1e-4)
  assert np.all(np.isfinite(np.asarray(mine.sqrt_alphas_cumprod)))


# ---------------------------------------------------------------------------
# iResBlock exact log-det
# ---------------------------------------------------------------------------

class _TorchMLP(torch.nn.Module):
  def __init__(self, w1, b1, w2, b2):
    super().__init__()
    self.l1 = torch.nn.Linear(w1.shape[1], w1.shape[0])
    self.l2 = torch.nn.Linear(w2.shape[1], w2.shape[0])
    with torch.no_grad():
      self.l1.weight.copy_(torch.from_numpy(w1))
      self.l1.bias.copy_(torch.from_numpy(b1))
      self.l2.weight.copy_(torch.from_numpy(w2))
      self.l2.bias.copy_(torch.from_numpy(b2))

  def forward(self, x):
    return self.l2(torch.tanh(self.l1(x)))


class _JaxMLPAdapter:
  """Minimal nnet protocol (init/apply) computing the identical MLP."""

  def __init__(self, w1, b1, w2, b2):
    # torch Linear weight is (out, in); store transposed for x @ w.
    self.w1, self.b1 = jnp.asarray(w1.T), jnp.asarray(b1)
    self.w2, self.b2 = jnp.asarray(w2.T), jnp.asarray(b2)

  def init(self, rng):
    return {}

  def apply(self, params, x, h=None):
    return jnp.tanh(x @ self.w1 + self.b1) @ self.w2 + self.b2


def _mlp_weights(seed=4, scale=0.35):
  rng = np.random.RandomState(seed)
  w1 = (scale * rng.randn(16, 2) / 4.0).astype(np.float32)
  b1 = (0.1 * rng.randn(16)).astype(np.float32)
  w2 = (scale * rng.randn(2, 16) / 4.0).astype(np.float32)
  b2 = (0.1 * rng.randn(2)).astype(np.float32)
  return w1, b1, w2, b2


def test_iresblock_exact_logdet_vs_reference_brute_force():
  """`iresblock.py:85-94` brute-force 2-D Jacobian determinant vs our
  `IResBlock.exact_logdet` full-Jacobian slogdet on the same weights."""
  irb = ref_module("flow_models.resflow.layers.iresblock")
  from indm_tpu.flows.resflow import IResBlock

  w1, b1, w2, b2 = _mlp_weights()
  x = np.random.RandomState(5).randn(8, 2).astype(np.float32)

  block_t = irb.iResBlock(_TorchMLP(w1, b1, w2, b2), brute_force=True)
  block_t.eval()
  y_t, neg_ld = block_t(torch.from_numpy(x), torch.zeros(8, 1))
  ld_ref = -t2n(neg_ld).reshape(-1)          # forward returns logpx - logdet

  block_j = IResBlock(_JaxMLPAdapter(w1, b1, w2, b2))
  params = block_j.init(jax.random.PRNGKey(0))
  ld_j = np.asarray(block_j.exact_logdet(params, jnp.asarray(x)))
  np.testing.assert_allclose(ld_j, ld_ref, rtol=1e-4, atol=1e-6)

  y_j, _ = block_j.forward(params, jnp.asarray(x))
  np.testing.assert_allclose(np.asarray(y_j), t2n(y_t), rtol=1e-5, atol=1e-6)


def test_iresblock_inverse_vs_reference():
  irb = ref_module("flow_models.resflow.layers.iresblock")
  from indm_tpu.flows.resflow import IResBlock

  w1, b1, w2, b2 = _mlp_weights(seed=6)
  y = np.random.RandomState(7).randn(8, 2).astype(np.float32)

  block_t = irb.iResBlock(_TorchMLP(w1, b1, w2, b2))
  block_t.eval()
  with torch.no_grad():
    x_ref = t2n(block_t._inverse_fixed_point(torch.from_numpy(y),
                                             atol=1e-7, rtol=1e-7))

  block_j = IResBlock(_JaxMLPAdapter(w1, b1, w2, b2),
                      inverse_atol=1e-7, inverse_rtol=1e-7)
  params = block_j.init(jax.random.PRNGKey(0))
  x_j, _ = block_j.inverse(params, jnp.asarray(y))
  np.testing.assert_allclose(np.asarray(x_j), x_ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Spectral normalization
# ---------------------------------------------------------------------------

def test_spectral_norm_linear_sigma_vs_reference():
  lip = ref_module("flow_models.resflow.layers.base.lipschitz")
  from indm_tpu.flows.lipschitz import SpectralNormLinear

  rng = np.random.RandomState(8)
  w = rng.randn(12, 6).astype(np.float32)      # torch layout (out, in)

  mod = lip.SpectralNormLinear(6, 12, coeff=0.97, n_iterations=None,
                               atol=1e-9, rtol=1e-9)
  with torch.no_grad():
    mod.weight.copy_(torch.from_numpy(w))
  w_norm_ref = t2n(mod.compute_weight(update=True, n_iterations=1000))
  sigma_ref = float(mod.scale)

  layer = SpectralNormLinear(6, 12, coeff=0.97)
  params = layer.init(jax.random.PRNGKey(0))
  params["w"] = jnp.asarray(w.T)               # ours is (in, out)
  params = layer.converge(params, n_iter=1000)
  w_norm_j, _ = layer.normalized_weight(params)

  sigma_svd = float(np.linalg.svd(w, compute_uv=False)[0])
  assert abs(sigma_ref - sigma_svd) < 1e-4 * sigma_svd
  np.testing.assert_allclose(np.asarray(w_norm_j).T, w_norm_ref,
                             rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# InceptionV3 (FID variant) architecture parity
# ---------------------------------------------------------------------------

def test_inception_fid_features_vs_reference(monkeypatch, tmp_path):
  """Build the reference pytorch-fid InceptionV3
  (`cleanfid/inception_pytorch.py:21-328`, via an architecture-only
  torchvision stub) with deterministic random weights, convert through
  `convert_torch_state_dict`, and assert the flax pool3 features and logits
  match torch to <=1e-4 (SURVEY §7.3 hard-part 5)."""
  import torchvision_inception_stub
  torchvision_inception_stub.install()
  ip = ref_module("cleanfid.inception_pytorch")
  from indm_tpu.metrics import inception

  # Bypass the pretrained-weight download: fid_inception_v3 keeps its
  # (stub-initialized) random weights.
  orig_load = torch.nn.Module.load_state_dict
  monkeypatch.setattr(ip, "load_state_dict_from_url", lambda *a, **k: None)
  monkeypatch.setattr(
      torch.nn.Module, "load_state_dict",
      lambda self, sd, strict=True: None if sd is None
      else orig_load(self, sd, strict=strict))

  fid_net = ip.fid_inception_v3()

  # Deterministic, forward-stable random weights (incl. BN buffers so the
  # conversion of running stats is actually exercised).
  gen = torch.Generator().manual_seed(0)
  with torch.no_grad():
    for p in fid_net.parameters():
      fan_in = max(int(np.prod(p.shape[1:])), 1)
      p.copy_(torch.randn(p.shape, generator=gen) / math.sqrt(fan_in))
    for name, b in fid_net.named_buffers():
      if name.endswith("running_mean"):
        b.copy_(0.1 * torch.randn(b.shape, generator=gen))
      elif name.endswith("running_var"):
        b.copy_(1.0 + 0.2 * torch.rand(b.shape, generator=gen))
  fid_net.eval()

  monkeypatch.setattr(ip, "fid_inception_v3", lambda: fid_net)
  wrapper = ip.InceptionV3(output_blocks=[3], resize_input=False,
                           normalize_input=True)
  wrapper.eval()

  x = np.random.RandomState(10).rand(2, 3, 299, 299).astype(np.float32)
  with torch.no_grad():
    pool_ref = t2n(wrapper(torch.from_numpy(x))[0]).reshape(2, -1)
    logits_ref = t2n(fid_net.fc(torch.from_numpy(pool_ref)))

  weights_path = str(tmp_path / "inception_parity.npz")
  inception.convert_torch_state_dict(fid_net.state_dict(), weights_path)
  params = inception.load_params(weights_path)
  pool_j, logits_j = inception.InceptionV3FID().apply(
      params, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

  assert np.max(np.abs(np.asarray(pool_j) - pool_ref)) < 1e-4
  assert np.max(np.abs(np.asarray(logits_j) - logits_ref)) < 1e-4


# ---------------------------------------------------------------------------
# Spectral normalization
# ---------------------------------------------------------------------------

def test_spectral_norm_conv_sigma_vs_reference():
  lip = ref_module("flow_models.resflow.layers.base.lipschitz")
  from indm_tpu.flows.lipschitz import SpectralNormConv2d

  rng = np.random.RandomState(9)
  w = rng.randn(4, 3, 3, 3).astype(np.float32)  # torch OIHW

  mod = lip.SpectralNormConv2d(3, 4, 3, 1, 1, coeff=0.97, n_iterations=None,
                               atol=1e-9, rtol=1e-9)
  with torch.no_grad():
    mod.weight.copy_(torch.from_numpy(w))
    mod.spatial_dims.copy_(torch.tensor([8.0, 8.0]))
  mod.compute_weight(update=True, n_iterations=500)
  sigma_ref = float(mod.scale)

  layer = SpectralNormConv2d(3, 4, 3, input_hw=(8, 8), coeff=0.97)
  params = layer.init(jax.random.PRNGKey(0))
  params["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
  params = layer.converge(params, n_iter=500)
  _, uv = layer.normalized_weight(params)
  sigma_j = float(jnp.sum(uv["u"] * layer._conv(params["w"], uv["v"])))

  np.testing.assert_allclose(sigma_j, sigma_ref, rtol=1e-4)

  # and both soft-normalize identically
  x = rng.randn(2, 3, 8, 8).astype(np.float32)
  mod.eval()
  with torch.no_grad():
    y_ref = t2n(mod(torch.from_numpy(x))) - t2n(mod.bias)[None, :, None,
                                                          None]
  params["b"] = jnp.zeros_like(params["b"])
  y_j, _ = layer.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
  np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_ref,
                             rtol=1e-4, atol=1e-5)


def test_torchscript_layout_converter_roundtrip(tmp_path):
  """`torchscript_to_fid_state_dict` (the cleanfid `inception-2015-12-05.pt`
  tfhub-name layout, `/root/reference/cleanfid/features.py:13-48`): a
  pytorch-fid state_dict renamed to tfhub graph names must convert back to
  EXACTLY the same flax weights as the direct path, and omitting the BN
  gamma (TF inception fixes scale=1) must synthesize ones."""
  from indm_tpu.metrics import inception

  import torchvision_inception_stub
  torchvision_inception_stub.install()
  ip = ref_module("cleanfid.inception_pytorch")

  # deterministic random fid net (reuse the stubbed architecture)
  torch.manual_seed(0)
  net = ip.fid_inception_v3.__wrapped__() if hasattr(
      ip.fid_inception_v3, "__wrapped__") else None
  if net is None:
    # fid_inception_v3 downloads weights; build via InceptionV3 pieces
    # by monkeypatching the loader like the main parity test does
    orig_load = torch.nn.Module.load_state_dict
    ip.load_state_dict_from_url = lambda *a, **k: None
    torch.nn.Module.load_state_dict = (
        lambda self, sd, strict=True: None if sd is None
        else orig_load(self, sd, strict=strict))
    try:
      net = ip.fid_inception_v3()
    finally:
      torch.nn.Module.load_state_dict = orig_load
  sd = net.state_dict()

  # rename to the tfhub layout (inverse of the converter's table)
  ts_named = {}
  for k, v in sd.items():
    if k.startswith("fc."):
      ts_named["output." + k.split(".", 1)[1]] = v
      continue
    if k.endswith("num_batches_tracked"):
      continue
    mod, leaf = k.rsplit(".", 2)[0], ".".join(k.rsplit(".", 2)[1:])
    unit = inception._tf_unit_name(mod)
    suffix = {"conv.weight": ".conv.weight", "bn.weight": ".bn.weight",
              "bn.bias": ".bn.bias", "bn.running_mean": ".bn.running_mean",
              "bn.running_var": ".bn.running_var"}[leaf]
    # exercise the prefix stripping too
    ts_named["layers." + unit + suffix] = v

  fid_sd = inception.torchscript_to_fid_state_dict(ts_named)
  p_direct = str(tmp_path / "direct.npz")
  p_ts = str(tmp_path / "ts.npz")
  inception.convert_torch_state_dict(
      {k: v for k, v in sd.items()
       if not k.endswith("num_batches_tracked")}, p_direct)
  inception.convert_torch_state_dict(fid_sd, p_ts)
  a = inception.load_params(p_direct)
  b = inception.load_params(p_ts)
  for la, lb in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

  # gamma-less layout (the actual TF graph): synthesized ones load and run
  ts_nog = {k: v for k, v in ts_named.items() if not k.endswith("bn.weight")}
  fid_nog = inception.torchscript_to_fid_state_dict(ts_nog)
  gname = "Mixed_5b.branch1x1.bn.weight"
  np.testing.assert_array_equal(
      np.asarray(fid_nog[gname]), np.ones_like(np.asarray(fid_nog[gname])))


def test_inception_score_from_logits_through_converter(tmp_path):
  """IS computed from the converted flax logits must match IS from the
  reference torch logits (the tfgan-style IS path, `evaluation.py:274-337`)
  on the same inputs."""
  from indm_tpu.metrics import inception, inception_score

  import torchvision_inception_stub
  torchvision_inception_stub.install()
  ip = ref_module("cleanfid.inception_pytorch")
  orig_load = torch.nn.Module.load_state_dict
  ip.load_state_dict_from_url = lambda *a, **k: None
  torch.nn.Module.load_state_dict = (
      lambda self, sd, strict=True: None if sd is None
      else orig_load(self, sd, strict=strict))
  try:
    net = ip.fid_inception_v3()
  finally:
    torch.nn.Module.load_state_dict = orig_load
  gen = torch.Generator().manual_seed(3)
  with torch.no_grad():
    for p in net.parameters():
      fan_in = max(int(np.prod(p.shape[1:])), 1)
      p.copy_(torch.randn(p.shape, generator=gen) / math.sqrt(fan_in))
  net.eval()

  ip.fid_inception_v3 = lambda: net
  wrapper = ip.InceptionV3(output_blocks=[3], resize_input=False,
                           normalize_input=True)
  wrapper.eval()
  x = np.random.RandomState(11).rand(4, 3, 299, 299).astype(np.float32)
  with torch.no_grad():
    pool_t = t2n(wrapper(torch.from_numpy(x))[0]).reshape(4, -1)
    logits_t = t2n(net.fc(torch.from_numpy(pool_t)))

  path = str(tmp_path / "is_parity.npz")
  inception.convert_torch_state_dict(
      {k: v for k, v in net.state_dict().items()
       if not k.endswith("num_batches_tracked")}, path)
  params = inception.load_params(path)
  _, logits_j = inception.InceptionV3FID().apply(
      params, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

  is_ref = inception_score(logits_t)
  is_jax = inception_score(np.asarray(logits_j))
  np.testing.assert_allclose(is_jax, is_ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# NCSN++: full-network forward parity through the checkpoint converter
# ---------------------------------------------------------------------------


def _tiny_score_cfg(name):
  from indm_tpu.configs import get_config
  cfg = get_config(name)
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 2
  cfg.model.ch_mult = (1, 2)
  cfg.model.attn_resolutions = (4,)
  cfg.model.dropout = 0.0
  return cfg


@pytest.mark.parametrize("name", ["vp/CIFAR10/indm_nll", "ve/CIFAR10/indm"])
def test_ncsnpp_forward_parity_via_converter(name):
  """The flax NCSN++ reproduces the ACTUAL reference torch NCSNpp
  (`/root/reference/models/ncsnpp.py:34-414`) on randomly-initialized
  weights mapped through `indm_tpu.models.convert.ncsnpp_params_from_torch`
  — pinning both the architecture and the published-checkpoint loading
  path. Covers the biggan/positional VP shape and the fir/fourier/
  progressive VE shape."""
  from indm_tpu.configs import get_config  # noqa: F401 (via _tiny_score_cfg)
  from indm_tpu.models import convert as convert_lib
  from indm_tpu.models.ncsnpp import NCSNpp

  cfg = _tiny_score_cfg(name)
  ref_ncsnpp = ref_module("models.ncsnpp")

  torch.manual_seed(0)
  net = ref_ncsnpp.NCSNpp(cfg)
  net.eval()
  # non-degenerate weights everywhere (init leaves zeros in init_scale=0
  # convs; overwrite all params with seeded gaussians)
  gen = torch.Generator().manual_seed(7)
  with torch.no_grad():
    for p in net.parameters():
      fan_in = max(int(np.prod(p.shape[1:])), 1)
      p.copy_(torch.randn(p.shape, generator=gen) / math.sqrt(fan_in))

  sd = {k: v for k, v in net.state_dict().items() if k != "sigmas"}
  params, buffers = convert_lib.ncsnpp_params_from_torch(sd, cfg)

  b = 2
  rs = np.random.RandomState(5)
  x = rs.rand(b, 3, cfg.data.image_size, cfg.data.image_size).astype(
      np.float32)
  if cfg.model.embedding_type == "fourier":
    time_cond = np.asarray([0.5, 7.3], np.float32)  # sigma labels (VE)
  else:
    time_cond = np.asarray([3.0, 777.0], np.float32)  # t*999-style labels

  with torch.no_grad():
    out_t = t2n(net(torch.from_numpy(x), torch.from_numpy(time_cond)))

  variables = {"params": params}
  if buffers:
    variables["buffers"] = buffers
  out_j = NCSNpp(cfg).apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            jnp.asarray(time_cond), train=False)
  out_j = np.asarray(out_j).transpose(0, 3, 1, 2)

  scale = max(np.abs(out_t).max(), 1e-6)
  np.testing.assert_allclose(out_j, out_t, atol=1e-4 * scale, rtol=1e-3)


def test_score_checkpoint_conversion_roundtrip(tmp_path):
  """Reference `checkpoint.pth` ({optimizer, model, ema, step},
  `utils.py:36-48`) -> scripts/convert_score_checkpoint.py -> msgpack ->
  our `restore_checkpoint`: params, EMA (rebuilt from the bare
  shadow_params list) and step all survive."""
  from indm_tpu import checkpoint as ckpt_lib
  from indm_tpu import state as state_lib
  from indm_tpu.models import create_model
  from indm_tpu.models import convert as convert_lib

  cfg = _tiny_score_cfg("vp/CIFAR10/indm_nll")
  ref_ncsnpp = ref_module("models.ncsnpp")
  torch.manual_seed(1)
  net = ref_ncsnpp.NCSNpp(cfg)

  model_sd = {k: v for k, v in net.state_dict().items() if k != "sigmas"}
  # EMA shadows = trainable params (all of them here: positional embedding,
  # no fourier W), shifted by +1 so EMA != params detectably
  shadow = [p.detach().clone() + 1.0 for p in net.parameters()
            if p.requires_grad]
  ckpt = {"model": {f"module.{k}": v for k, v in model_sd.items()},
          "ema": {"decay": 0.9999, "num_updates": 1234,
                  "shadow_params": shadow},
          "optimizer": {}, "step": 1234}
  pth = tmp_path / "checkpoint.pth"
  torch.save(ckpt, pth)

  # drive the CLI main() with the tiny config patched in by name
  import importlib.util
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  spec = importlib.util.spec_from_file_location(
      "convert_score_checkpoint",
      os.path.join(root, "scripts", "convert_score_checkpoint.py"))
  cli = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(cli)
  import indm_tpu.configs as cfgs
  out = tmp_path / "converted.msgpack"
  orig_get_config, cfgs.get_config = cfgs.get_config, lambda name: cfg
  orig_argv = sys.argv
  try:
    sys.argv = ["convert_score_checkpoint.py", str(pth), "tiny", str(out)]
    cli.main()
  finally:
    cfgs.get_config = orig_get_config
    sys.argv = orig_argv
  assert out.exists()

  params, buffers = convert_lib.ncsnpp_params_from_torch(ckpt["model"], cfg)
  ema_sd = convert_lib.ema_state_dict_from_torch(ckpt, cfg)
  ema_params, _ = convert_lib.ncsnpp_params_from_torch(ema_sd, cfg)

  import jax
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  opt = state_lib.make_optimizer(cfg)
  state = state_lib.init_train_state(
      cfg, params, {k: v for k, v in variables.items() if k != "params"},
      opt, jax.random.PRNGKey(0))
  state = state.replace(ema_params=ema_params,
                        step=jnp.asarray(1234, jnp.int32))
  path = str(tmp_path / "direct.msgpack")
  ckpt_lib.save_checkpoint(path, jax.device_get(state))

  fresh = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"}, opt,
      jax.random.PRNGKey(2))
  restored = ckpt_lib.restore_checkpoint(cfg, path, fresh)
  assert int(restored.step) == 1234
  # EMA = params + 1 everywhere (the shadow shift), proving order-correct
  # reconstruction of the bare shadow_params list
  diffs = jax.tree_util.tree_map(lambda e, p: np.max(np.abs(e - p - 1.0)),
                                 restored.ema_params, restored.params)
  assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6
