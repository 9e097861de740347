"""Residual flow (invertible ResNets) — functional JAX core, NHWC.

Re-design of the reference resflow tree
(`/root/reference/flow_models/resflow/resflow_.py`,
`layers/iresblock.py`, and the wolf conditional copy
`flow_models/wolf/flows/resflow/`). One library serves both: optional
conditioning `h` replaces the duplicated tree (SURVEY.md §7.4).

TPU-first choices:
  * layers follow an explicit functional protocol (init/forward/inverse on
    param pytrees) so `jax.vjp`, `lax.while_loop` fixed-point inverses and
    the Neumann log-det estimator compose without lifted-transform overhead;
  * the unbiased Russian-roulette log-det (`iresblock.py:96-123`) samples
    n ~ Poisson on device and runs a dynamic-length `while_loop` for the
    STOP-GRADIENT Neumann accumulation, then one differentiable VJP — the
    exact gradient-path trick of `neumann_logdet_estimator`
    (`iresblock.py:249-258`) with no Python-level dynamic shapes;
  * the fixed-point inverse (`iresblock.py:69-79`) is a `lax.while_loop`
    with per-element tolerance and a 1000-iteration cap.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax import lax

from indm_tpu.flows import lipschitz as lip

# ---------------------------------------------------------------------------
# Lipschitz activations (`flow_models/resflow/layers/base/activations.py`)
# ---------------------------------------------------------------------------


def sin_act(x):
  """INDM default: sin(2*pi*x)/(2*pi) — 1-Lipschitz (`activations.py:7-12`)."""
  return jnp.sin(2.0 * jnp.pi * x) / jnp.pi * 0.5


def swish_act(x, beta=0.5):
  return x * jax.nn.sigmoid(x * jax.nn.softplus(beta)) / 1.1


def lipschitz_cube(x):
  return jnp.where(x >= 1, x - 2 / 3,
                   jnp.where(x <= -1, x + 2 / 3, x ** 3 / 3))


def max_min(x):
  b, d = x.shape
  xr = x.reshape(b, d // 2, 2)
  return jnp.concatenate([jnp.max(xr, 2), jnp.min(xr, 2)], axis=1)


def full_sort(x):
  return jnp.sort(x, axis=1)


ACT_FNS = {
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "swish": swish_act,
    "lcube": lipschitz_cube,
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "sin": sin_act,
}


# ---------------------------------------------------------------------------
# Squeeze (`flow_models/resflow/layers/squeeze.py`), torch channel ordering
# (out channel = c*4 + dy*2 + dx) kept for checkpoint compatibility.
# ---------------------------------------------------------------------------


def squeeze_nhwc(x, factor: int = 2):
  b, h, w, c = x.shape
  x = x.reshape(b, h // factor, factor, w // factor, factor, c)
  x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h2, w2, c, dy, dx)
  return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze_nhwc(x, factor: int = 2):
  b, h, w, c4 = x.shape
  c = c4 // (factor * factor)
  x = x.reshape(b, h, w, c, factor, factor)
  x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, dy, w, dx, c)
  return x.reshape(b, h * factor, w * factor, c)


class SqueezeLayer:
  def __init__(self, factor: int = 2):
    self.factor = factor

  def init(self, rng):
    return {}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = squeeze_nhwc(x, self.factor)
    return (y, logpx) if logpx is not None else (y, None)

  def inverse(self, params, y, logpy=None, h=None):
    x = unsqueeze_nhwc(y, self.factor)
    return (x, logpy) if logpy is not None else (x, None)


class ActNorm2d:
  """Per-channel affine with log-det (`layers/act_norm.py`; data-dependent
  init is inert in INDM — `act_norm.py:20`). y = (x + bias) * exp(log_scale),
  logdet = H*W*sum(log_scale)."""

  def __init__(self, num_ch: int):
    self.num_ch = num_ch

  def init(self, rng):
    return {"bias": jnp.zeros((self.num_ch,)),
            "log_scale": jnp.zeros((self.num_ch,))}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = (x + params["bias"]) * jnp.exp(params["log_scale"])
    if logpx is None:
      return y, None
    ld = x.shape[1] * x.shape[2] * jnp.sum(params["log_scale"])
    return y, logpx - ld

  def inverse(self, params, y, logpy=None, h=None):
    x = y * jnp.exp(-params["log_scale"]) - params["bias"]
    if logpy is None:
      return x, None
    ld = y.shape[1] * y.shape[2] * jnp.sum(params["log_scale"])
    return x, logpy + ld


class ActNorm1d(ActNorm2d):
  """1-D actnorm over [batch, features] (`layers/act_norm.py:86-97`):
  same affine, logdet has no H*W factor."""

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = (x + params["bias"]) * jnp.exp(params["log_scale"])
    if logpx is None:
      return y, None
    return y, logpx - jnp.sum(params["log_scale"])

  def inverse(self, params, y, logpy=None, h=None):
    x = y * jnp.exp(-params["log_scale"]) - params["bias"]
    if logpy is None:
      return x, None
    return x, logpy + jnp.sum(params["log_scale"])


class InvertibleLinear:
  """Glow-style invertible dense layer (`layers/glow.py:7-32`):
  y = x @ W, logdet = log|det W| per sample."""

  def __init__(self, dim: int):
    self.dim = dim

  def init(self, rng):
    return {"w": jax.random.orthogonal(rng, self.dim)}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = x @ params["w"]
    if logpx is None:
      return y, None
    _, ld = jnp.linalg.slogdet(params["w"])
    return y, logpx - ld

  def inverse(self, params, y, logpy=None, h=None):
    x = y @ jnp.linalg.inv(params["w"])
    if logpy is None:
      return x, None
    _, ld = jnp.linalg.slogdet(params["w"])
    return x, logpy + ld


class Inverse:
  """Orientation-swapping wrapper (`layers/container.py:33-43`)."""

  def __init__(self, flow):
    self.flow = flow

  def init(self, rng):
    return self.flow.init(rng)

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    return self.flow.inverse(params, x, logpx, h=h)

  def inverse(self, params, y, logpy=None, h=None, rng=None, train=False):
    return self.flow.forward(params, y, logpy, h=h, rng=rng, train=train)


class MovingBatchNorm2d:
  """Invertible mean-shift normalization with a moving running mean
  (`layers/normalization.py:8-104`): y = x - mean + bias, logdet = 0 (pure
  translation — the reference applies no scaling).

  Training forward uses the batch mean (the bn_lag=0 default); the running
  mean is a buffer in `params` updated functionally via `update_stats`
  (the torch in-place `running_mean -= decay*(running_mean - batch_mean)`
  made explicit). Inverse always uses the running mean, as in the
  reference."""

  axes = (0, 1, 2)  # reduce over N, H, W

  def __init__(self, num_ch: int, decay: float = 0.1, affine: bool = True):
    self.num_ch = num_ch
    self.decay = decay
    self.affine = affine

  def init(self, rng):
    p = {"running_mean": jnp.zeros((self.num_ch,)),
         "step": jnp.zeros((), jnp.int32)}
    if self.affine:
      p["bias"] = jnp.zeros((self.num_ch,))
    return p

  def _mean(self, params, x, train):
    if train:
      return jnp.mean(x, axis=self.axes)
    return params["running_mean"]

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    mean = self._mean(params, x, train)
    y = x - mean
    if self.affine:
      y = y + params["bias"]
    return y, logpx

  def inverse(self, params, y, logpy=None, h=None):
    if self.affine:
      y = y - params["bias"]
    x = y + params["running_mean"]
    return x, logpy

  def update_stats(self, params, x):
    """Returns params with the running mean moved toward the batch mean."""
    batch_mean = jnp.mean(x, axis=self.axes)
    new = dict(params)
    new["running_mean"] = (params["running_mean"]
                           - self.decay * (params["running_mean"]
                                           - batch_mean))
    new["step"] = params["step"] + 1
    return new


class MovingBatchNorm1d(MovingBatchNorm2d):
  """1-D variant over [batch, features] (`normalization.py:88-93`)."""

  axes = (0,)


class InvertibleConv2d:
  """Glow-style 1x1 invertible conv (`layers/glow.py`)."""

  def __init__(self, num_ch: int):
    self.num_ch = num_ch

  def init(self, rng):
    w = jax.random.orthogonal(rng, self.num_ch)
    return {"w": w}

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    y = jnp.einsum("bhwc,cd->bhwd", x, params["w"])
    if logpx is None:
      return y, None
    _, ld = jnp.linalg.slogdet(params["w"])
    return y, logpx - x.shape[1] * x.shape[2] * ld

  def inverse(self, params, y, logpy=None, h=None):
    w_inv = jnp.linalg.inv(params["w"])
    x = jnp.einsum("bhwc,cd->bhwd", y, w_inv)
    if logpy is None:
      return x, None
    _, ld = jnp.linalg.slogdet(params["w"])
    return x, logpy + y.shape[1] * y.shape[2] * ld


# ---------------------------------------------------------------------------
# The Lipschitz residual net g(x) inside each iResBlock
# (`resflow_.py:432-479`: kernels '3-1-3', Lip conv -> act -> cond Lip conv
# -> act -> Lip conv; INDM: coeff 0.98, vnorms 'ffff', act sin, idim 512).
# ---------------------------------------------------------------------------


class LipschitzNNet:
  def __init__(self, in_ch: int, idim: int, kernels=(3, 1, 3),
               coeff: float = 0.98, act: str = "sin",
               cond_dim: Optional[int] = None, preact: bool = False,
               domains=None, codomains=None,
               mixed_precision: bool = False):
    inf = float("inf")
    n = len(kernels)
    domains = [inf] * n if domains is None else domains
    codomains = [inf] * n if codomains is None else codomains
    self.act = ACT_FNS[act]
    self.preact = preact
    self.mixed_precision = mixed_precision
    self.convs = []
    dims = [in_ch] + [idim] * (n - 1) + [in_ch]
    for i, k in enumerate(kernels):
      cd = cond_dim if (cond_dim is not None and 0 < i < n - 1) else None
      self.convs.append(lip.get_conv2d(dims[i], dims[i + 1], k, coeff,
                                       domains[i], codomains[i], cond_dim=cd))

  def init(self, rng):
    keys = jax.random.split(rng, len(self.convs))
    return [c.init(k) for c, k in zip(self.convs, keys)]

  def apply(self, params, x, h=None):
    dtype = jnp.bfloat16 if self.mixed_precision else None
    if dtype is not None:
      # bf16 compute with f32 master params: each conv normalizes its
      # weight in f32 (exact Lipschitz bound) and runs the convolution in
      # bf16 (MXU rate); the caller sees f32 out, so residual adds and
      # log-det reductions stay f32.
      x = x.astype(dtype)
    if self.preact:
      x = self.act(x)
    for i, (conv, p) in enumerate(zip(self.convs, params)):
      x = conv.apply(p, x, h=h if conv.cond_dim is not None else None,
                     dtype=dtype)
      if i < len(self.convs) - 1:
        # named so the scan remat policy can OPTIONALLY keep the
        # pre-activations (skips the sin-heavy forward recompute in the
        # backward at ~2 GB HBM for the flagship; flow.remat_save_preacts)
        x = jax.ad_checkpoint.checkpoint_name(x, "lip_preact")
        x = self.act(x)
    return x.astype(jnp.float32) if dtype is not None else x

  def converge(self, params, n_iter: int = 200):
    """Converged power-iteration projection for stateful layers
    (`resflow/utils.py:126-132`); identity for Lop layers."""
    return [c.converge(p, n_iter) if hasattr(c, "converge") else p
            for c, p in zip(self.convs, params)]

  def fused_chain_ok(self) -> bool:
    """True when the fully-fused forward+chain Pallas kernel supports this
    net: sin activation, exactly the 3-1-3 LopConv2d geometry."""
    return (self.act is sin_act and len(self.convs) == 3
            and all(isinstance(c, lip.LopConv2d) for c in self.convs)
            and self.convs[0].k == 3 and self.convs[1].k == 1
            and self.convs[2].k == 3
            # packing assumes narrow image channels, wide intermediate
            and self.convs[0].in_ch < 33 <= self.convs[0].out_ch)

  def chain_mats(self, params, x, h=None, dtype=None):
    """Ingredients of the fused Pallas Neumann chain
    (`indm_tpu.ops.neumann_pallas`): transposed normalized conv kernels and
    activation-derivative diagonals, in application order (outermost W^T
    first). Returns None when this net's shape isn't kernel-supported
    (non-sin activation, non-Lop convs, kernel size not in {1, 3}).

    Replicates `apply`'s forward exactly (h-conditioning, bf16 casts) to
    capture the pre-activation values; everything here is meant to run
    under stop_gradient."""
    from indm_tpu.ops import neumann_pallas

    if self.act is not sin_act:
      return None
    if not all(isinstance(c, lip.LopConv2d) and c.k in (1, 3)
               for c in self.convs):
      return None

    def dact(a):  # d/dx of sin(2*pi*x)/(2*pi)
      return jnp.cos(2.0 * jnp.pi * a)

    if dtype is not None:
      x = x.astype(dtype)
    dacts_fwd = [dact(x)] if self.preact else []
    if self.preact:
      x = self.act(x)
    weights_fwd = []
    for i, (conv, p) in enumerate(zip(self.convs, params)):
      if conv.cond_dim is not None and h is not None:
        h_w, h_b = p["h_w"], p["h_b"]
        if dtype is not None:
          h_w, h_b = h_w.astype(dtype), h_b.astype(dtype)
        x = x + (h.astype(x.dtype) @ h_w + h_b)[:, None, None, :]
      w = conv.normalized_weight(p)
      if dtype is not None:
        w = w.astype(dtype)
      weights_fwd.append(w)
      x = lip.lipschitz_conv_apply(x, w, conv.k)
      b = p["b"].astype(x.dtype) if dtype is not None else p["b"]
      x = x + b
      if i < len(self.convs) - 1:
        dacts_fwd.append(dact(x))
        x = self.act(x)

    weights_t = [neumann_pallas.transpose_conv_kernel(w)
                 for w in reversed(weights_fwd)]
    dacts = list(reversed(dacts_fwd))  # [d_out, d_mid, (d_in if preact)]
    return weights_t, dacts


# ---------------------------------------------------------------------------
# iResBlock (`layers/iresblock.py`)
# ---------------------------------------------------------------------------

_MAX_RCDF = 128


def _poisson_rcdf_table(lamb: float, offset: int) -> np.ndarray:
  """rcdf[k] = P(n >= k - offset) for k = 0.._MAX_RCDF
  (`iresblock.py:294-303`)."""
  out = np.ones(_MAX_RCDF + 1, np.float64)
  for k in range(_MAX_RCDF + 1):
    m = k - offset
    if m <= 0:
      out[k] = 1.0
    else:
      s = sum(lamb ** i / math.factorial(i) for i in range(m))
      out[k] = max(1.0 - math.exp(-lamb) * s, 1e-12)
  return out.astype(np.float32)


def _geometric_rcdf_table(p: float, offset: int) -> np.ndarray:
  out = np.ones(_MAX_RCDF + 1, np.float64)
  for k in range(_MAX_RCDF + 1):
    m = k - offset
    out[k] = 1.0 if m <= 0 else (1 - p) ** max(m - 1, 0)
  return np.maximum(out, 1e-12).astype(np.float32)


class IResBlock:
  """Invertible residual block y = x + g(x) with stochastic log-det.

  `nnet` is a LipschitzNNet (or anything with init/apply(params, x, h)).
  """

  def __init__(self, nnet, n_dist: str = "poisson", lamb: float = 2.0,
               geom_p: float = 0.5, n_samples: int = 1,
               n_power_series: Optional[int] = None,
               n_exact_terms: int = 2, neumann_grad: bool = True,
               inverse_atol: float = 1e-5, inverse_rtol: float = 1e-5,
               inverse_max_iter: int = 1000,
               unroll_terms: Optional[int] = None,
               chain_bf16: bool = False,
               chain_pallas: bool = False,
               fused_block: bool = False):
    self.nnet = nnet
    self.n_dist = n_dist
    self.lamb = lamb
    self.geom_p = geom_p
    self.n_samples = n_samples
    self.n_power_series = n_power_series
    self.n_exact_terms = n_exact_terms
    self.neumann_grad = neumann_grad
    self.inverse_atol = inverse_atol
    self.inverse_rtol = inverse_rtol
    self.inverse_max_iter = inverse_max_iter
    # unroll_terms > 0: replace the dynamic-length Neumann while_loop with a
    # FIXED unroll of that many VJP terms (coefficients still carry the
    # Russian-roulette reweighting; the sampled n is clipped to the unroll
    # length, a O((L^unroll)) truncation bias for Lipschitz constant L<=0.98).
    # Compiles to much simpler HLO — preferable inside scanned stacks.
    self.unroll_terms = unroll_terms
    # chain_bf16: run the STOP-GRADIENT Neumann VJP chain in bfloat16
    # (f32 accumulation of the series). The chain only shapes the Hutchinson
    # estimator's vector u — bf16 there perturbs an already-stochastic
    # estimate by O(2^-8) per term while doubling MXU throughput; the
    # differentiable path (g, the final VJP, all gradients) stays f32.
    self.chain_bf16 = chain_bf16
    # chain_pallas: run the stop-gradient Neumann chain as ONE fused Pallas
    # kernel (weights + activation derivatives resident in VMEM across all
    # sampled terms — indm_tpu/ops/neumann_pallas.py). Falls back to the
    # XLA while_loop when the nnet shape isn't kernel-supported.
    self.chain_pallas = chain_pallas
    # fused_block: the round-3 custom-VJP kernel PAIR
    # (indm_tpu/ops/fused_block.py) — forward + Neumann chain + J^T u in
    # one kernel (each sin/cos evaluated once), full backward (incl. the
    # second-order logdet terms) in a second kernel that recomputes
    # in-VMEM. Takes precedence over chain_pallas when the geometry is
    # supported; falls back otherwise.
    self.fused_block = fused_block
    self._rcdf = {}
    for offset in (n_exact_terms, 20):
      if n_dist == "poisson":
        self._rcdf[offset] = jnp.asarray(_poisson_rcdf_table(lamb, offset))
      else:
        self._rcdf[offset] = jnp.asarray(_geometric_rcdf_table(geom_p, offset))

  def init(self, rng):
    return {"nnet": self.nnet.init(rng)}

  def converge(self, params, n_iter: int = 200):
    if hasattr(self.nnet, "converge"):
      return {"nnet": self.nnet.converge(params["nnet"], n_iter)}
    return params

  def _sample_n(self, rng):
    if self.n_dist == "poisson":
      return jax.random.poisson(rng, self.lamb).astype(jnp.int32)
    return jax.random.geometric(rng, self.geom_p).astype(jnp.int32)

  def _g(self, params, x, h):
    return self.nnet.apply(params["nnet"], x, h=h)

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False,
              noise=None):
    if logpx is None:
      return x + self._g(params, x, h), None
    g, logdet = self._logdetgrad(params, x, h, rng, train, noise=noise)
    return x + g, logpx - logdet

  def inverse(self, params, y, logpy=None, h=None, rng=None, train=False):
    x = self._inverse_fixed_point(params, y, h)
    if logpy is None:
      return x, None
    _, logdet = self._logdetgrad(params, x, h, rng, train)
    return x, logpy + logdet

  def _inverse_fixed_point(self, params, y, h):
    """`iresblock.py:69-79`: x_{k+1} = y - g(x_k) until per-element tol."""
    g_fn = lambda xx: self._g(params, xx, h)
    tol = self.inverse_atol + jnp.abs(y) * self.inverse_rtol
    x0 = y - g_fn(y)

    def cond(carry):
      x, x_prev, i = carry
      not_conv = jnp.any((x - x_prev) ** 2 / tol >= 1.0)
      return jnp.logical_and(not_conv, i <= self.inverse_max_iter)

    def body(carry):
      x, _, i = carry
      return y - g_fn(x), x, i + 1

    x, _, _ = lax.while_loop(cond, body, (x0, y, jnp.asarray(0, jnp.int32)))
    return x

  def _coeffs(self, n, offset):
    """coeff(k) = 1{n >= k-offset} / rcdf(k, offset) for n_samples=1
    (`iresblock.py:111-123`). Returns a fn k -> traced coeff."""
    table = self._rcdf.get(offset)
    if table is None:
      if self.n_dist == "poisson":
        table = jnp.asarray(_poisson_rcdf_table(self.lamb, offset))
      else:
        table = jnp.asarray(_geometric_rcdf_table(self.geom_p, offset))
      self._rcdf[offset] = table

    def coeff(k):
      ind = (n >= k - offset).astype(jnp.float32)
      return ind / table[jnp.clip(k, 0, _MAX_RCDF)]

    return coeff

  def _rcdf_table(self, offset):
    if offset in self._rcdf:
      return self._rcdf[offset]
    return (jnp.asarray(_poisson_rcdf_table(self.lamb, offset))
            if self.n_dist == "poisson"
            else jnp.asarray(_geometric_rcdf_table(self.geom_p, offset)))

  def _pallas_chain(self, params_sg, x_sg, h_sg, vareps, n, offset):
    """Fused-VMEM Neumann accumulator (indm_tpu/ops/neumann_pallas.py);
    returns acc (f32) or None when unsupported. Interpret mode keeps the
    path testable off-TPU.

    Prefers the FULLY-fused kernel (forward sin/cos derivatives computed
    in-kernel; the 512-wide diagonals never touch HBM); falls back to the
    dacts-as-inputs kernel via `chain_mats`, then to None (XLA chain)."""
    from indm_tpu.ops import neumann_pallas

    dtype = jnp.bfloat16 if (self.chain_bf16 or getattr(
        self.nnet, "mixed_precision", False)) else None
    table = self._rcdf_table(offset)
    eps = vareps.astype(dtype) if dtype is not None else vareps
    interpret = jax.default_backend() != "tpu"
    preact = getattr(self.nnet, "preact", False)

    # The fully-fused variant (forward recomputed in-kernel) measured
    # SLOWER end-to-end on v5e than the dacts-as-inputs kernel (430 vs
    # 315 ms flow fwd+logdet; see PERF.md) — keep it opt-in for further
    # kernel work.
    use_fused = os.environ.get("INDM_FUSED_CHAIN", "0") == "1"
    if use_fused and getattr(self.nnet, "fused_chain_ok", lambda: False)():
      fwd_mats, biases, chain_mats_t, hp = neumann_pallas.fused_chain_inputs(
          self.nnet.convs, params_sg["nnet"], h_sg, dtype)
      x_in = x_sg.astype(dtype) if dtype is not None else x_sg
      return neumann_pallas.fused_neumann_chain_pallas(
          x_in, eps, fwd_mats, biases, chain_mats_t, hp, n, offset, table,
          preact=preact, interpret=interpret)

    chain_fn = getattr(self.nnet, "chain_mats", None)
    if chain_fn is None:
      return None
    mats = chain_fn(params_sg["nnet"], x_sg, h=h_sg, dtype=dtype)
    if mats is None:
      return None
    weights_t, dacts = mats
    return neumann_pallas.neumann_chain_pallas(
        eps, dacts, weights_t, n, offset, table, preact=preact,
        interpret=interpret)

  def _logdetgrad(self, params, x, h, rng, train, noise=None):
    """g(x) and an estimator of logdet|d(x+g)/dx| (`iresblock.py:81-164`).

    `noise=(vareps, n)` supplies PRE-SAMPLED estimator randomness
    (ScannedIResBlocks hoists the sampling out of the scan body as one
    batched draw — bit-identical values, but sampled once instead of
    per-block-sequentially and not recomputed by the remat backward)."""
    b = x.shape[0]
    if noise is not None:
      vareps, n_presampled = noise
    else:
      rng_n, rng_eps = jax.random.split(rng)
      vareps = jax.random.normal(rng_eps, x.shape)
      n_presampled = None

    if self.n_power_series is not None:
      # Truncated (biased) estimator: fixed length, coeff = 1.
      n_pow = jnp.asarray(self.n_power_series, jnp.int32)
      coeff = lambda k: jnp.asarray(1.0)
    else:
      offset = self.n_exact_terms if train else 20
      n = (n_presampled if n_presampled is not None
           else self._sample_n(rng_n))
      n_pow = n + offset
      coeff = self._coeffs(n, offset)

    sg = lax.stop_gradient
    params_sg = jax.tree_util.tree_map(sg, params)
    h_sg = None if h is None else sg(h)
    x_sg = sg(x)

    if (train and self.neumann_grad and self.fused_block
        and self.n_power_series is None
        and getattr(self.nnet, "fused_chain_ok", lambda: False)()):
      # custom-VJP fused kernel pair: forward + chain + J^T u in one
      # kernel, complete backward in another (fused_block.py). The
      # Lipschitz normalization and h-projection stay in XLA so their
      # gradients chain normally.
      from indm_tpu.ops import fused_block as fused_lib

      n_kernel = n
      if self.unroll_terms:
        n_kernel = jnp.minimum(n, self.unroll_terms - offset)
      table = self._rcdf_table(offset)
      ps = params["nnet"]
      convs = self.nnet.convs
      nws = tuple(c.normalized_weight(p) for c, p in zip(convs, ps))
      bs = tuple(p["b"] for p in ps)
      hp = None
      if convs[1].cond_dim is not None and h is not None:
        hp = h @ ps[1]["h_w"] + ps[1]["h_b"]
      dtype_name = ("bfloat16" if (self.chain_bf16 or getattr(
          self.nnet, "mixed_precision", False)) else "float32")
      cfg = (offset, bool(self.nnet.preact), dtype_name,
             jax.default_backend() != "tpu")
      y, logdet = fused_lib.fused_block_apply(
          cfg, x, nws[0], nws[1], nws[2], bs[0], bs[1], bs[2], hp,
          vareps, n_kernel, table)
      # forward() adds x again; the +x/-x pair cancels in both primal
      # and gradient
      return y - x, logdet

    if train and self.neumann_grad:
      # Neumann series under stop_gradient, then ONE differentiable VJP
      # (`iresblock.py:249-258`).
      u_acc = None
      if self.chain_pallas and self.n_power_series is None:
        n_kernel = n
        if self.unroll_terms:
          # honor flow.logdet_unroll under flow.logdet_pallas: the fixed
          # unroll truncates the series at unroll_terms total terms, which
          # for the dynamic kernel is the clip n_pow <= unroll_terms
          n_kernel = jnp.minimum(n, self.unroll_terms - offset)
        u_acc = self._pallas_chain(params_sg, x_sg, h_sg, vareps, n_kernel,
                                   offset)
      if u_acc is not None:
        u = jax.ad_checkpoint.checkpoint_name(sg(vareps + u_acc),
                                              "neumann_u")
        g, vjp = jax.vjp(lambda xx: self._g(params, xx, h), x)
        (jtu,) = vjp(u)
        logdet = jnp.sum((jtu * vareps).reshape(b, -1), axis=-1)
        return g, logdet

      if self.chain_bf16:
        bf = jnp.bfloat16
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, t)
        g_out, vjp_sg_raw = jax.vjp(
            lambda xx: self._g(cast(params_sg), xx,
                               None if h_sg is None else cast(h_sg)),
            x_sg.astype(bf))
        # cotangent must match the primal OUTPUT dtype (f32 when the nnet
        # casts back, bf16 otherwise); the input cotangent comes back in
        # the input dtype (bf16) and is accumulated in f32.
        out_dt = g_out.dtype
        vjp_sg = lambda v: (
            vjp_sg_raw(v.astype(out_dt))[0].astype(jnp.float32),)
      else:
        _, vjp_sg = jax.vjp(lambda xx: self._g(params_sg, xx, h_sg), x_sg)

      if self.unroll_terms:
        # fixed unroll: same coefficients, n clipped to the unroll length
        v = vareps
        acc = jnp.zeros_like(vareps)
        for k in range(1, self.unroll_terms + 1):
          (v,) = vjp_sg(v)
          sign = -1.0 if k % 2 == 1 else 1.0
          acc = acc + sign * coeff(jnp.asarray(k, jnp.int32)) * v
      else:
        def body(carry):
          k, v, acc = carry
          (v,) = vjp_sg(v)
          sign = 1.0 - 2.0 * (k % 2).astype(jnp.float32)  # (-1)^k
          acc = acc + sign * coeff(k) * v
          return k + 1, v, acc

        def cond_fn(carry):
          k, _, _ = carry
          return k <= n_pow

        _, _, acc = lax.while_loop(
            cond_fn, body,
            (jnp.asarray(1, jnp.int32), vareps, jnp.zeros_like(vareps)))
      # Mark the (stop-gradient) Neumann output as checkpoint-saveable: it is
      # one block-input-sized tensor, and saving it lets the rematerialized
      # backward of a scanned block skip re-running the whole VJP chain
      # (which would double the per-term cost).
      u = jax.ad_checkpoint.checkpoint_name(sg(vareps + acc), "neumann_u")

      g, vjp = jax.vjp(lambda xx: self._g(params, xx, h), x)
      (jtu,) = vjp(u)
      logdet = jnp.sum((jtu * vareps).reshape(b, -1), axis=-1)
      return g, logdet

    # Basic estimator (eval / neumann off): sum_k (-1)^{k+1}/k coeff(k)
    # <(J^T)^k eps, eps> (`iresblock.py:238-246`), all stop-gradient in eval.
    g, vjp = jax.vjp(lambda xx: self._g(params, xx, h), x)

    def body(carry):
      k, v, acc = carry
      (v,) = vjp(v)
      tr = jnp.sum((v * vareps).reshape(b, -1), axis=-1)
      sign = -(1.0 - 2.0 * (k % 2).astype(jnp.float32))  # (-1)^{k+1}
      acc = acc + sign / k.astype(jnp.float32) * coeff(k) * tr
      return k + 1, v, acc

    def cond_fn(carry):
      k, _, _ = carry
      return k <= n_pow

    _, _, logdet = lax.while_loop(
        cond_fn, body,
        (jnp.asarray(1, jnp.int32), vareps, jnp.zeros((b,), x.dtype)))
    return g, logdet

  def exact_logdet(self, params, x, h=None):
    """Brute-force log|det(I + Jg)| via full Jacobian — test oracle
    (`iresblock.py:85-94,146-157`). Small shapes only."""
    b = x.shape[0]
    d = int(np.prod(x.shape[1:]))

    def g_flat(xf):
      return self._g(params, xf.reshape((1,) + x.shape[1:]),
                     None if h is None else h[:1]).reshape(-1)

    def one(xi, hi):
      def g_flat_i(xf):
        return self._g(params, xf.reshape((1,) + x.shape[1:]),
                       None if h is None else hi[None]).reshape(-1)
      jac = jax.jacfwd(g_flat_i)(xi.reshape(-1))
      sign, ld = jnp.linalg.slogdet(jnp.eye(d) + jac)
      return ld

    if h is None:
      return jax.vmap(lambda xi: one(xi, None))(x)
    return jax.vmap(one)(x, h)


# ---------------------------------------------------------------------------
# Containers (`layers/container.py`)
# ---------------------------------------------------------------------------


class SequentialFlow:
  def __init__(self, layers: Sequence):
    self.layers = list(layers)

  def init(self, rng):
    keys = jax.random.split(rng, max(len(self.layers), 1))
    return [l.init(k) for l, k in zip(self.layers, keys)]

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    if rng is None:
      rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, max(len(self.layers), 1))
    for layer, p, k in zip(self.layers, params, keys):
      x, logpx = layer.forward(p, x, logpx, h=h, rng=k, train=train)
    return x, logpx

  def inverse(self, params, y, logpy=None, h=None, rng=None, train=False):
    if rng is None:
      rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, max(len(self.layers), 1))
    for layer, p, k in zip(reversed(self.layers), reversed(params),
                           keys):
      if isinstance(layer, (IResBlock, ScannedIResBlocks)):
        y, logpy = layer.inverse(p, y, logpy, h=h, rng=k, train=train)
      else:
        y, logpy = layer.inverse(p, y, logpy, h=h)
    return y, logpy

  def converge(self, params, n_iter: int = 200):
    return [l.converge(p, n_iter) if hasattr(l, "converge") else p
            for l, p in zip(self.layers, params)]


class ScannedIResBlocks:
  """A stack of IDENTICAL iResBlocks executed as one `lax.scan` over
  stacked parameters — the TPU-first alternative to unrolling N blocks: the
  compiler sees ONE block body per scale instead of N copies (compile time
  and code size drop ~N x, runtime unchanged).

  With `remat=True` (default) the scan body is wrapped in `jax.checkpoint`:
  the backward pass then stores only each block's (B,H,W,C) input instead of
  every 512-wide Lipschitz-net intermediate of every Neumann VJP term —
  without it the joint step needs ~30 GB of scan-stacked activations at
  batch 128 and cannot fit a 16 GB v5e chip."""

  def __init__(self, block: IResBlock, n: int, remat: bool = True,
               save_preacts: bool = False):
    self.block = block
    self.n = n
    self.remat = remat
    self.save_preacts = save_preacts

  def init(self, rng):
    keys = jax.random.split(rng, self.n)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[self.block.init(k) for k in keys])

  def converge(self, params, n_iter: int = 200):
    return jax.vmap(lambda p: self.block.converge(p, n_iter))(params)

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    keys = jax.random.split(rng, self.n)
    has_logp = logpx is not None
    lp0 = logpx if has_logp else jnp.zeros((x.shape[0],), x.dtype)

    if has_logp and isinstance(self.block, IResBlock):
      # Hoist the estimator randomness out of the scan: one batched draw
      # replaces n sequential in-body draws (and the remat backward no
      # longer re-draws them). vmap over the SAME per-block keys the body
      # would have split makes the values bit-identical to in-body
      # sampling (threefry is a pure function of key+shape).
      pair = jax.vmap(jax.random.split)(keys)
      vareps_all = jax.vmap(
          lambda k: jax.random.normal(k, x.shape))(pair[:, 1])
      if self.block.n_power_series is None:
        n_all = jax.vmap(self.block._sample_n)(pair[:, 0])
      else:
        n_all = jnp.zeros((self.n,), jnp.int32)

      stacked = self._fused_stack(params, x, lp0, h, vareps_all, n_all,
                                  train)
      if stacked is not None:
        return stacked

      def body(carry, xs):
        xc, lp = carry
        p, veps, nb = xs
        xc, lp_out = self.block.forward(p, xc, lp, h=h, train=train,
                                        noise=(veps, nb))
        return (xc, lp_out), None

      xs = (params, vareps_all, n_all)
    else:

      def body(carry, xs):
        xc, lp = carry
        p, k = xs
        xc, lp_out = self.block.forward(p, xc, lp if has_logp else None,
                                        h=h, rng=k, train=train)
        return (xc, lp_out if has_logp else lp), None

      xs = (params, keys)

    if self.remat:
      # Save the per-block Neumann outputs (block-input-sized, tiny) so the
      # backward recompute skips the stop-gradient VJP chain entirely;
      # everything else (the 512-wide Lipschitz-net intermediates)
      # rematerializes.
      names = ("neumann_u", "lip_preact") if self.save_preacts \
          else ("neumann_u",)
      body = jax.checkpoint(
          body,
          policy=jax.checkpoint_policies.save_only_these_names(*names))
    (x, lp), _ = jax.lax.scan(body, (x, lp0), xs)
    return x, (lp if has_logp else None)

  def _fused_stack(self, params, x, lp0, h, vareps_all, n_all, train):
    """The whole stack in ONE Pallas kernel pair per direction
    (`indm_tpu.ops.fused_stack`): removes the per-block dispatch +
    prologue overhead the scan pays 2 x n_blocks times per step
    (~28 ms/step at the flagship geometry, PERF.md round 4). Same math,
    same hoisted randomness, same residuals as the scanned
    `fused_block_apply` path. Returns (y, logp) or None when the
    geometry/config doesn't qualify (the scan runs instead)."""
    blk = self.block
    if not (train and blk.fused_block and blk.neumann_grad
            and blk.n_power_series is None
            and getattr(blk.nnet, "fused_chain_ok", lambda: False)()
            and os.environ.get("INDM_FUSED_STACK", "1") != "0"):
      return None
    from indm_tpu.ops.fused_stack import fused_stack_apply

    offset = blk.n_exact_terms
    n_kernel = n_all
    if blk.unroll_terms:
      n_kernel = jnp.minimum(n_all, blk.unroll_terms - offset)
    table = blk._rcdf_table(offset)
    convs = blk.nnet.convs
    ps = params["nnet"]
    nws = tuple(jax.vmap(c.normalized_weight)(p)
                for c, p in zip(convs, ps))
    bs = tuple(p["b"] for p in ps)
    hp_all = None
    if convs[1].cond_dim is not None and h is not None:
      hp_all = jax.vmap(lambda p: h @ p["h_w"] + p["h_b"])(ps[1])
    dtype_name = ("bfloat16" if (blk.chain_bf16 or getattr(
        blk.nnet, "mixed_precision", False)) else "float32")
    cfg = (offset, bool(blk.nnet.preact), dtype_name,
           jax.default_backend() != "tpu")
    y, ld_sum = fused_stack_apply(cfg, x, nws[0], nws[1], nws[2],
                                  bs[0], bs[1], bs[2], hp_all,
                                  vareps_all, n_kernel, table)
    return y, lp0 - ld_sum

  def inverse(self, params, y, logpy=None, h=None, rng=None, train=False):
    keys = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0),
                            self.n)
    has_logp = logpy is not None
    lp0 = logpy if has_logp else jnp.zeros((y.shape[0],), y.dtype)

    def body(carry, xs):
      yc, lp = carry
      p, k = xs
      yc, lp_out = self.block.inverse(p, yc, lp if has_logp else None,
                                      h=h, rng=k, train=train)
      return (yc, lp_out if has_logp else lp), None

    (y, lp), _ = jax.lax.scan(body, (y, lp0), (params, keys), reverse=True)
    return y, (lp if has_logp else None)


def build_stacked_iresblocks(in_ch: int, idim: int, n_blocks: int,
                             squeeze: bool, coeff: float, vnorms: str,
                             kernels: str, activation_fn: str,
                             n_exact_terms: int, n_dist: str,
                             cond_dim: Optional[int], preact: bool,
                             first_resblock: bool,
                             actnorm: bool = False,
                             unroll_terms: Optional[int] = None,
                             chain_bf16: bool = False,
                             chain_pallas: bool = False,
                             mixed_precision: bool = False,
                             save_preacts: bool = False,
                             fused_block: bool = False
                             ) -> SequentialFlow:
  """`StackediResBlocks` for resblock_type='resflow'
  (`resflow_.py:337-518`). Homogeneous runs of blocks are folded into a
  single `lax.scan` (ScannedIResBlocks); only the first block of the first
  scale differs (no pre-activation, `resflow_.py:442-444`)."""
  inf = float("inf")
  ps = [inf if c == "f" else float(c) for c in vnorms]
  domains, codomains = ps[:-1], ps[1:]
  ks = [int(k) for k in kernels.split("-")]
  assert len(domains) == len(ks)

  def make_block(preact_flag):
    nnet = LipschitzNNet(in_ch, idim, kernels=tuple(ks), coeff=coeff,
                         act=activation_fn, cond_dim=cond_dim,
                         preact=preact_flag,
                         domains=domains, codomains=codomains,
                         mixed_precision=mixed_precision)
    return IResBlock(nnet, n_dist=n_dist, n_exact_terms=n_exact_terms,
                     unroll_terms=unroll_terms, chain_bf16=chain_bf16,
                     chain_pallas=chain_pallas, fused_block=fused_block)

  chain = []
  if actnorm:
    # interleaved actnorms prevent scanning; fall back to the explicit chain
    for i in range(n_blocks):
      is_first = first_resblock and i == 0
      chain.append(make_block(preact and not is_first))
      chain.append(ActNorm2d(in_ch))
  else:
    n_special = 1 if first_resblock else 0
    if n_special:
      chain.append(make_block(False))
    rest = n_blocks - n_special
    if rest == 1:
      chain.append(make_block(preact))
    elif rest > 1:
      chain.append(ScannedIResBlocks(make_block(preact), rest,
                                     remat=not fused_block,
                                     save_preacts=save_preacts))
  if squeeze:
    chain.append(SqueezeLayer(2))
  return SequentialFlow(chain)


class LipschitzFCNet:
  """Fully-connected Lipschitz net for fc-type iResBlocks
  (`resflow_.py:521-558`): flatten -> LopLinear/act chain -> reshape."""

  def __init__(self, input_shape, idim, nhidden, coeff, act="sin",
               domains=None, codomains=None, preact=False):
    inf = float("inf")
    self.input_shape = tuple(input_shape)  # (H, W, C)
    dim = int(np.prod(input_shape))
    n = nhidden + 1
    domains = [inf] * n if domains is None else domains
    codomains = [inf] * n if codomains is None else codomains
    self.act = ACT_FNS[act]
    self.preact = preact
    dims = [dim] + [idim] * nhidden + [dim]
    self.linears = [lip.get_linear(dims[i], dims[i + 1], coeff,
                                   domains[i], codomains[i])
                    for i in range(n)]
    self.cond_dim = None

  def init(self, rng):
    keys = jax.random.split(rng, len(self.linears))
    return [l.init(k) for l, k in zip(self.linears, keys)]

  def apply(self, params, x, h=None):
    b = x.shape[0]
    y = x.reshape(b, -1)
    if self.preact:
      y = self.act(y)
    for i, (lin, p) in enumerate(zip(self.linears, params)):
      y = lin.apply(p, y)
      if i < len(self.linears) - 1:
        y = self.act(y)
    return y.reshape((b,) + self.input_shape)


def build_stacked_coupling_blocks(in_ch: int, idim: int, n_blocks: int,
                                  squeeze: bool, kernels: str,
                                  activation_fn: str, init_layer=None,
                                  actnorm: bool = False,
                                  swap_start: bool = True) -> SequentialFlow:
  """`StackedCouplingBlocks` (`resflow_.py:588-730`): channel couplings when
  no init layer, masked checkerboard couplings otherwise."""
  from indm_tpu.flows import coupling as coupling_lib
  ks = [int(k) for k in kernels.split("-")]
  chain = []
  if init_layer is not None:
    chain.append(init_layer)
  swap = swap_start
  for _ in range(n_blocks):
    swap = not swap
    if init_layer is None:
      net = coupling_lib.ConvNet(in_ch // 2, in_ch, idim, tuple(ks),
                                 act=activation_fn
                                 if activation_fn in ACT_FNS else "elu")
      chain.append(coupling_lib.ChannelCouplingBlock(
          in_ch, net, mask_type=f"channel{int(swap)}"))
    else:
      net = coupling_lib.ConvNet(in_ch, in_ch * 2, idim, tuple(ks),
                                 act="elu")
      chain.append(coupling_lib.MaskedCouplingBlock(
          in_ch, net, mask_type=f"checkerboard{int(swap)}"))
    if actnorm:
      chain.append(ActNorm2d(in_ch))
  if squeeze:
    chain.append(SqueezeLayer(2))
  return SequentialFlow(chain)


class ResidualFlow:
  """Multi-scale residual flow (`resflow_.py:20-335`), NHWC,
  factor_out=False (the INDM configuration).

  fwdpass maps image x -> image-shaped latent (repeated pixel-shuffle of the
  deepest feature map — the '-' de-interleave of
  `flow_models/flow_model.py:14-16` generalized to any scale count);
  bwdpass inverts it.
  """

  def __init__(self, image_hw: int, in_ch: int, n_blocks=(16, 16),
               intermediate_dim: int = 512, coeff: float = 0.98,
               vnorms: str = "ffff", kernels: str = "3-1-3",
               activation_fn: str = "sin", n_exact_terms: int = 2,
               n_dist: str = "poisson", cond_dim: Optional[int] = None,
               preact: bool = True, first_resblock: bool = True,
               actnorm: bool = False, block_type: str = "resblock",
               unroll_terms: Optional[int] = None,
               chain_bf16: bool = False,
               chain_pallas: bool = False,
               mixed_precision: bool = False,
               save_preacts: bool = False,
               fused_block: bool = False):
    n_scale_max = 0
    hw = image_hw
    while hw >= 4:
      n_scale_max += 1
      hw //= 2
    self.n_scale = min(len(n_blocks), n_scale_max)
    assert self.n_scale > 0
    self.in_ch = in_ch
    self.image_hw = image_hw
    self.transforms = []
    c = in_ch
    for i in range(self.n_scale):
      if block_type == "resblock":
        self.transforms.append(build_stacked_iresblocks(
            in_ch=c, idim=intermediate_dim, n_blocks=n_blocks[i],
            squeeze=(i < self.n_scale - 1), coeff=coeff, vnorms=vnorms,
            kernels=kernels, activation_fn=activation_fn,
            n_exact_terms=n_exact_terms, n_dist=n_dist, cond_dim=cond_dim,
            preact=preact, first_resblock=first_resblock and (i == 0),
            actnorm=actnorm, unroll_terms=unroll_terms,
            chain_bf16=chain_bf16, chain_pallas=chain_pallas,
            mixed_precision=mixed_precision, save_preacts=save_preacts,
            fused_block=fused_block))
      elif block_type == "coupling":
        self.transforms.append(build_stacked_coupling_blocks(
            in_ch=c, idim=intermediate_dim, n_blocks=n_blocks[i],
            squeeze=(i < self.n_scale - 1), kernels=kernels,
            activation_fn=activation_fn, actnorm=actnorm))
      else:
        raise ValueError(block_type)
      c *= 4

  def init(self, rng):
    keys = jax.random.split(rng, self.n_scale)
    return [t.init(k) for t, k in zip(self.transforms, keys)]

  def converge(self, params, n_iter: int = 200):
    """Post-step Lipschitz projection over all scales
    (`resflow/utils.py:126-132`)."""
    return [t.converge(p, n_iter) for t, p in zip(self.transforms, params)]

  def forward(self, params, x, logpx=None, h=None, rng=None, train=False):
    if rng is None:
      rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, self.n_scale)
    for t, p, k in zip(self.transforms, params, keys):
      x, logpx = t.forward(p, x, logpx, h=h, rng=k, train=train)
    return x, logpx

  def inverse(self, params, z, logpz=None, h=None, rng=None, train=False):
    if rng is None:
      rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, self.n_scale)
    for t, p, k in zip(reversed(self.transforms), reversed(params),
                       keys):
      z, logpz = t.inverse(p, z, logpz, h=h, rng=k, train=train)
    return z, logpz

  def _to_image_layout(self, z):
    for _ in range(self.n_scale - 1):
      z = unsqueeze_nhwc(z, 2)
    return z

  def _from_image_layout(self, z):
    for _ in range(self.n_scale - 1):
      z = squeeze_nhwc(z, 2)
    return z

  def fwdpass(self, params, x, h=None, rng=None, train=False,
              eval_logdet: bool = True):
    """(`wolf resflow_.py:310-324`). Returns (z_image_layout, logpx) with
    logpx the accumulated -log|det| bookkeeping started at 0: for the
    reference, fwdpass returns logpx = 0 - sum(logdet) (negative log-det)."""
    logpx = jnp.zeros((x.shape[0],), x.dtype) if eval_logdet else None
    out, logpx = self.forward(params, x, logpx, h=h, rng=rng, train=train)
    out = self._to_image_layout(out)
    if eval_logdet:
      return out, logpx
    return out, None

  def bwdpass(self, params, z, h=None, rng=None, train=False):
    """(`wolf resflow_.py:326-335`)."""
    z = self._from_image_layout(z)
    x, _ = self.inverse(params, z, None, h=h, rng=rng, train=train)
    return x, None
