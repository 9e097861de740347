"""Lipschitz-constrained linear/conv layers (functional, NHWC).

Port of the reference's Lipschitz layer zoo
(`/root/reference/flow_models/resflow/layers/base/lipschitz.py` and the wolf
copy with conditional convs). Two families matter:

  * Lop* (operator-norm bound): deterministic soft normalization
    `W / max(1, ||W||_op / coeff)` where the operator norm is a row/column
    p-norm picked by (domain, codomain) (`lipschitz.py:485-509`). INDM's
    shipped configs use `vnorms='ffff'` == (inf, inf) everywhere
    (`flow_models/flow_model.py:97`), which resolves to LopConv2d/LopLinear
    (`lipschitz.py:512-533`) — NO power-iteration state, fully differentiable
    and jit-trivial. This is the hot path.

  * SpectralNorm* (sigma via power iteration): u/v vectors are explicit
    state threaded through the step; the training forward runs 1 iteration
    under stop_gradient (`lipschitz.py:259-262`), and `update_lipschitz`
    (`flow_models/resflow/utils.py:126-132`) reprojects to convergence after
    each optimizer step.

Layers follow the functional protocol: `init(rng, ...) -> params`,
`apply(params, x, ...) -> y`. Conv weights are HWIO.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def operator_norm_settings(domain, codomain) -> Tuple[bool, float]:
  """(max_across_input_dims, norm_type) by (domain, codomain)
  (`lipschitz.py:485-509`)."""
  inf = float("inf")
  if domain == 1 and codomain == 1:
    return True, 1
  if domain == 1 and codomain == 2:
    return True, 2
  if domain == 1 and codomain == inf:
    return True, inf
  if domain == 2 and codomain == inf:
    return False, 2
  if domain == inf and codomain == inf:
    return False, 1
  raise ValueError(f"Unknown domain/codomain combination ({domain},{codomain})")


def _kaiming_uniform(rng, shape, fan_in):
  """torch kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
  bound = 1.0 / math.sqrt(fan_in)
  return jax.random.uniform(rng, shape, minval=-bound, maxval=bound)


def _lop_scale(w: jnp.ndarray, norm_type, axes):
  """p-norm of w reduced over `axes` (kept axes give the per-row/col bound);
  equivalent to torch `_norm_except_dim` (`lipschitz.py:469-482`)."""
  if norm_type == 1:
    return jnp.sum(jnp.abs(w), axis=axes)
  if norm_type == 2:
    return jnp.sqrt(jnp.sum(w ** 2, axis=axes))
  if norm_type == float("inf"):
    return jnp.max(jnp.abs(w), axis=axes)
  raise ValueError(norm_type)


def _conv3x3_narrow_out(x, w):
  """SAME 3x3 conv with few OUTPUT channels, written as ONE dot over the
  wide channel dim followed by 9 shift-adds on the narrow result.

  XLA-TPU's direct conv for (wide -> narrow) shapes reads the wide input
  with a layout-transposing access pattern (measured ~32 GiB/s on v5e —
  HBM-bound at 4% of peak); the dot reads it once, contiguously, on the
  MXU. The VJP is the transposed pattern (dot + slice-adds), which is the
  same fix applied to the narrow->wide direction."""
  b, hh, ww, cin = x.shape
  kh, kw, _, cout = w.shape
  wr = w.transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)
  z = (x.reshape(-1, cin) @ wr).reshape(b, hh, ww, kh, kw, cout)
  zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
  y = zp[:, 0:hh, 0:ww, 0, 0]
  for dy in range(kh):
    for dx in range(kw):
      if dy == 0 and dx == 0:
        continue
      y = y + zp[:, dy:dy + hh, dx:dx + ww, dy, dx]
  return y


def _conv3x3_narrow_in(x, w):
  """SAME 3x3 conv with few INPUT channels: gather the 9 shifted views of
  the cheap narrow tensor, then ONE dot into the wide output."""
  b, hh, ww, cin = x.shape
  kh, kw, _, cout = w.shape
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  patches = jnp.concatenate(
      [xp[:, dy:dy + hh, dx:dx + ww] for dy in range(kh)
       for dx in range(kw)], axis=-1)
  wr = w.reshape(kh * kw * cin, cout)
  return (patches.reshape(-1, kh * kw * cin) @ wr).reshape(b, hh, ww, cout)


# dispatch threshold: a channel dim this small forces XLA's conv emitter
# into a layout-thrashing access of the wide side.
_NARROW_CH = 17


def lipschitz_conv_apply(x, w, k):
  """SAME conv dispatch: dot-based paths for narrow-boundary 3x3 convs,
  plain XLA conv otherwise."""
  if k == 3 and w.shape[3] < _NARROW_CH <= w.shape[2]:
    return _conv3x3_narrow_out(x, w)
  if k == 3 and w.shape[2] < _NARROW_CH <= w.shape[3]:
    return _conv3x3_narrow_in(x, w)
  return lax.conv_general_dilated(
      x, w, window_strides=(1, 1), padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


class LopConv2d:
  """Operator-norm-bounded conv (`lipschitz.py:320-368`), NHWC/HWIO.

  With optional global-linear conditioning on h (wolf's LopCondConv2d,
  `flow_models/wolf/flows/resflow/layers/base/lipschitz.py:373-441`):
  the conditioning vector is projected to in_channels and added to the input.
  """

  def __init__(self, in_ch, out_ch, kernel_size, coeff=0.97,
               domain=float("inf"), codomain=float("inf"),
               cond_dim: Optional[int] = None, local_constraint=True):
    self.in_ch, self.out_ch, self.k = in_ch, out_ch, kernel_size
    self.coeff = coeff
    self.cond_dim = cond_dim
    self.local_constraint = local_constraint
    self.max_across_input_dims, self.norm_type = operator_norm_settings(
        domain, codomain)

  def init(self, rng):
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    fan_in = self.in_ch * self.k * self.k
    p = {
        "w": _kaiming_uniform(r1, (self.k, self.k, self.in_ch, self.out_ch),
                              fan_in),
        "b": _kaiming_uniform(r2, (self.out_ch,), fan_in),
    }
    if self.cond_dim is not None:
      bound = 1.0 / math.sqrt(self.cond_dim)
      p["h_w"] = _kaiming_uniform(r3, (self.cond_dim, self.in_ch),
                                  self.cond_dim)
      p["h_b"] = jax.random.uniform(r4, (self.in_ch,), minval=-bound,
                                    maxval=bound)
    return p

  def normalized_weight(self, params):
    # HWIO; torch keeps dim 1 (in) when max_across_input_dims else dim 0
    # (out) (`lipschitz.py:345-347,349-358`).
    w = params["w"]
    if self.max_across_input_dims:
      scale = _lop_scale(w, self.norm_type, axes=(0, 1, 3))  # keep in
      bshape = (1, 1, self.in_ch, 1)
    else:
      scale = _lop_scale(w, self.norm_type, axes=(0, 1, 2))  # keep out
      bshape = (1, 1, 1, self.out_ch)
    if not self.local_constraint:
      scale = jnp.max(scale)
      bshape = ()
    factor = jnp.maximum(1.0, scale / self.coeff)
    return w / factor.reshape(bshape) if bshape else w / factor

  def apply(self, params, x, h=None, dtype=None):
    if self.cond_dim is not None:
      assert h is not None
      h_w, h_b = params["h_w"], params["h_b"]
      if dtype is not None:
        h_w, h_b = h_w.astype(dtype), h_b.astype(dtype)
      hp = h.astype(x.dtype) @ h_w + h_b
      x = x + hp[:, None, None, :]
    # Lipschitz normalization in f32 on the master weight; optional cast of
    # the normalized weight for bf16 MXU compute.
    w = self.normalized_weight(params)
    b = params["b"]
    if dtype is not None:
      w, b = w.astype(dtype), b.astype(dtype)
    return lipschitz_conv_apply(x, w, self.k) + b

  def lipschitz_scale(self, params):
    axes = (0, 1, 3) if self.max_across_input_dims else (0, 1, 2)
    return jnp.max(_lop_scale(params["w"], self.norm_type, axes))


class LopLinear:
  """Operator-norm-bounded dense layer (`lipschitz.py:274-317`)."""

  def __init__(self, in_dim, out_dim, coeff=0.97, domain=float("inf"),
               codomain=float("inf"), local_constraint=True):
    self.in_dim, self.out_dim = in_dim, out_dim
    self.coeff = coeff
    self.local_constraint = local_constraint
    self.max_across_input_dims, self.norm_type = operator_norm_settings(
        domain, codomain)

  def init(self, rng):
    r1, r2 = jax.random.split(rng)
    return {
        "w": _kaiming_uniform(r1, (self.in_dim, self.out_dim), self.in_dim),
        "b": _kaiming_uniform(r2, (self.out_dim,), self.in_dim),
    }

  def normalized_weight(self, params):
    w = params["w"]  # (in, out)
    if self.max_across_input_dims:
      scale = _lop_scale(w, self.norm_type, axes=(1,))  # keep in
      factor = jnp.maximum(1.0, scale / self.coeff)
      return w / factor[:, None]
    scale = _lop_scale(w, self.norm_type, axes=(0,))    # keep out
    if not self.local_constraint:
      scale = jnp.max(scale)
      return w / jnp.maximum(1.0, scale / self.coeff)
    factor = jnp.maximum(1.0, scale / self.coeff)
    return w / factor[None, :]

  def apply(self, params, x, h=None):
    return x @ self.normalized_weight(params) + params["b"]


class SpectralNormConv2d:
  """Spectral-norm conv with explicit power-iteration state
  (`lipschitz.py:102-271`). State = {'u','v'} full-tensor singular vectors
  updated by conv/conv_transpose iterations. The forward does one update
  under stop_gradient in train mode; `converge` reprojects after a step."""

  def __init__(self, in_ch, out_ch, kernel_size, input_hw, coeff=0.97,
               n_iterations=None, atol=1e-3, rtol=1e-3):
    self.in_ch, self.out_ch, self.k = in_ch, out_ch, kernel_size
    self.h, self.w = input_hw
    self.coeff = coeff
    self.n_iterations = n_iterations
    self.atol, self.rtol = atol, rtol

  def init(self, rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    fan_in = self.in_ch * self.k * self.k
    w = _kaiming_uniform(r1, (self.k, self.k, self.in_ch, self.out_ch),
                         fan_in)
    b = _kaiming_uniform(r2, (self.out_ch,), fan_in)
    v = jax.random.normal(r3, (1, self.h, self.w, self.in_ch))
    v = v / jnp.linalg.norm(v)
    u = self._conv(w, v)
    u = u / jnp.linalg.norm(u)
    return {"w": w, "b": b, "u": u, "v": v}

  def _conv(self, w, v):
    return lax.conv_general_dilated(
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

  def _conv_t(self, w, u):
    return lax.conv_general_dilated(
        u, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

  def _power_iter(self, w, u, v, n_iter):
    def body(i, carry):
      u, v = carry
      v = self._conv_t(w, u)
      v = v / (jnp.linalg.norm(v) + 1e-12)
      u = self._conv(w, v)
      u = u / (jnp.linalg.norm(u) + 1e-12)
      return u, v
    return lax.fori_loop(0, n_iter, body, (u, v))

  def normalized_weight(self, params, update: bool = False, n_iter: int = 1):
    w = params["w"]
    u, v = params["u"], params["v"]
    if update:
      u, v = self._power_iter(lax.stop_gradient(w), u, v, n_iter)
      u, v = lax.stop_gradient(u), lax.stop_gradient(v)
    sigma = jnp.sum(u * self._conv(w, v))
    factor = jnp.maximum(1.0, sigma / self.coeff)
    return w / factor, {"u": u, "v": v}

  def apply(self, params, x, h=None, train: bool = False):
    w, new_uv = self.normalized_weight(params, update=train)
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["b"], new_uv

  def converge(self, params, n_iter: int = 200):
    """Post-step converged reprojection (`resflow/utils.py:126-132`)."""
    u, v = self._power_iter(params["w"], params["u"], params["v"], n_iter)
    return {**params, "u": u, "v": v}


# ---------------------------------------------------------------------------
# Induced-norm layers (mixed/general p-norms) — port of
# `flow_models/resflow/layers/base/mixed_lipschitz.py:13-405`.
# The operator norm ||W||_{domain->codomain} is estimated by the generalized
# power iteration (qetlab InducedMatrixNorm algorithm); u/v live in the
# parameter pytree as explicit state. Forward uses the CURRENT u/v without
# updating (`mixed_lipschitz.py:135-137`); the post-step `update_lipschitz`
# projection calls `converge`.
# ---------------------------------------------------------------------------


def _projmax(v):
  """All mass on the largest |entry| (`mixed_lipschitz.py` projmax_)."""
  idx = jnp.argmax(jnp.abs(v))
  return jnp.zeros_like(v).at[idx].set(jnp.sign(v[idx]))


def _vector_norm(x, p):
  return jnp.sum(jnp.abs(x) ** p) ** (1.0 / p)


def normalize_v(v, domain):
  if domain == 2:
    return v / (jnp.linalg.norm(v) + 1e-12)
  if domain == 1:
    return _projmax(v)
  vabs = jnp.abs(v)
  vph = jnp.where(vabs > 0, v / jnp.maximum(vabs, 1e-38), 1.0)
  vabs = vabs / jnp.max(vabs)
  vabs = vabs ** (1.0 / (domain - 1.0))
  return vph * vabs / (_vector_norm(vabs, domain) + 1e-12)


def normalize_u(u, codomain):
  if codomain == 2:
    return u / (jnp.linalg.norm(u) + 1e-12)
  if codomain == float("inf"):
    return _projmax(u)
  uabs = jnp.abs(u)
  uph = jnp.where(uabs > 0, u / jnp.maximum(uabs, 1e-38), 1.0)
  uabs = uabs / jnp.max(uabs)
  uabs = uabs ** (codomain - 1.0)
  if codomain == 1:
    return uph * uabs / (jnp.max(jnp.abs(uabs)) + 1e-12)
  return uph * uabs / (_vector_norm(uabs, codomain / (codomain - 1.0))
                       + 1e-12)


class InducedNormLinear:
  """`mixed_lipschitz.py:13-147`."""

  def __init__(self, in_dim, out_dim, coeff=0.97, domain=2, codomain=2):
    self.in_dim, self.out_dim = in_dim, out_dim
    self.coeff = coeff
    self.domain, self.codomain = domain, codomain

  def init(self, rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    w = _kaiming_uniform(r1, (self.in_dim, self.out_dim), self.in_dim)
    b = _kaiming_uniform(r2, (self.out_dim,), self.in_dim)
    params = {"w": w, "b": b}
    # best-of-10 random restarts at init (`mixed_lipschitz.py:44-58`)
    best = None
    n_restarts = 1 if (self.domain == 2 and self.codomain == 2) else 10
    for i in range(n_restarts):
      ru, rv = jax.random.split(jax.random.fold_in(r3, i))
      u = normalize_u(jax.random.normal(ru, (self.out_dim,)), self.codomain)
      v = normalize_v(jax.random.normal(rv, (self.in_dim,)), self.domain)
      u, v = self._power_iter(w, u, v, 200)
      sigma = u @ (v @ w)
      if best is None or sigma > best[0]:
        best = (sigma, u, v)
    params["u"], params["v"] = best[1], best[2]
    return params

  def _power_iter(self, w, u, v, n_iter):
    def body(i, carry):
      u, v = carry
      u = normalize_u(v @ w, self.codomain)          # W v
      v = normalize_v(w @ u, self.domain)            # W^T u
      return u, v
    return jax.lax.fori_loop(0, n_iter, body, (u, v))

  def normalized_weight(self, params):
    u, v = lax.stop_gradient(params["u"]), lax.stop_gradient(params["v"])
    sigma = u @ (v @ params["w"])
    factor = jnp.maximum(1.0, sigma / self.coeff)
    return params["w"] / factor

  def apply(self, params, x, h=None):
    return x @ self.normalized_weight(params) + params["b"]

  def converge(self, params, n_iter: int = 200):
    u, v = self._power_iter(lax.stop_gradient(params["w"]), params["u"],
                            params["v"], n_iter)
    return {**params, "u": u, "v": v}

  def compute_one_iter(self, params):
    """One monitoring iteration of sigma (`mixed_lipschitz.py:77-90`):
    u^T W v after a single fresh power step, without touching state."""
    u, v = self._power_iter(lax.stop_gradient(params["w"]),
                            params["u"], params["v"], 1)
    return u @ (v @ lax.stop_gradient(params["w"]))


class InducedNormConv2d:
  """`mixed_lipschitz.py:150-405`: full-tensor u/v iterated by
  conv / conv-transpose under general p-norms."""

  def __init__(self, in_ch, out_ch, kernel_size, input_hw, coeff=0.97,
               domain=2, codomain=2, cond_dim=None):
    self.in_ch, self.out_ch, self.k = in_ch, out_ch, kernel_size
    self.h, self.w = input_hw
    self.coeff = coeff
    self.domain, self.codomain = domain, codomain
    self.cond_dim = cond_dim

  def _conv(self, w, v):
    return lax.conv_general_dilated(
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

  def _conv_t(self, w, u):
    return lax.conv_general_dilated(
        u, jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

  def _power_iter(self, w, u, v, n_iter):
    def body(i, carry):
      u, v = carry
      u = self._conv(w, v)
      u = normalize_u(u.reshape(-1), self.codomain).reshape(u.shape)
      v = self._conv_t(w, u)
      v = normalize_v(v.reshape(-1), self.domain).reshape(v.shape)
      return u, v
    return lax.fori_loop(0, n_iter, body, (u, v))

  def init(self, rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    fan_in = self.in_ch * self.k * self.k
    w = _kaiming_uniform(r1, (self.k, self.k, self.in_ch, self.out_ch),
                         fan_in)
    b = _kaiming_uniform(r2, (self.out_ch,), fan_in)
    ru, rv = jax.random.split(r3)
    v = jax.random.normal(rv, (1, self.h, self.w, self.in_ch))
    v = normalize_v(v.reshape(-1), self.domain).reshape(v.shape)
    u = self._conv(w, v)
    u = normalize_u(u.reshape(-1), self.codomain).reshape(u.shape)
    u, v = self._power_iter(w, u, v, 200)
    return {"w": w, "b": b, "u": u, "v": v}

  def normalized_weight(self, params):
    u = lax.stop_gradient(params["u"])
    v = lax.stop_gradient(params["v"])
    sigma = jnp.sum(u * self._conv(params["w"], v))
    factor = jnp.maximum(1.0, sigma / self.coeff)
    return params["w"] / factor

  def apply(self, params, x, h=None, dtype=None):
    w = self.normalized_weight(params)
    b = params["b"]
    if dtype is not None:
      w, b = w.astype(dtype), b.astype(dtype)
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b

  def converge(self, params, n_iter: int = 200):
    u, v = self._power_iter(lax.stop_gradient(params["w"]), params["u"],
                            params["v"], n_iter)
    return {**params, "u": u, "v": v}

  def compute_one_iter(self, params):
    """One monitoring iteration of sigma (`mixed_lipschitz.py:239-252`)."""
    w = lax.stop_gradient(params["w"])
    u, v = self._power_iter(w, params["u"], params["v"], 1)
    return jnp.sum(u * self._conv(w, v))


def get_conv2d(in_ch, out_ch, kernel_size, coeff, domain, codomain,
               cond_dim=None, input_hw=None, **kwargs):
  """Factory mirroring `lipschitz.py:523-533` + wolf's `get_convcond2d`:
  Lop layers for the operator-norm-computable (domain, codomain) pairs,
  InducedNorm power iteration otherwise."""
  inf = float("inf")
  lop_ok = (domain == 1 and codomain in (1, 2, inf)) or \
           (codomain == inf and domain in (2, inf))
  if lop_ok:
    return LopConv2d(in_ch, out_ch, kernel_size, coeff=coeff, domain=domain,
                     codomain=codomain, cond_dim=cond_dim)
  if input_hw is None:
    raise ValueError("InducedNormConv2d requires input_hw for its u/v state")
  return InducedNormConv2d(in_ch, out_ch, kernel_size, input_hw, coeff=coeff,
                           domain=domain, codomain=codomain,
                           cond_dim=cond_dim)


def get_linear(in_dim, out_dim, coeff, domain, codomain, **kwargs):
  inf = float("inf")
  lop_ok = (domain == 1 and codomain in (1, 2, inf)) or \
           (codomain == inf and domain in (2, inf))
  if lop_ok:
    return LopLinear(in_dim, out_dim, coeff=coeff, domain=domain,
                     codomain=codomain)
  return InducedNormLinear(in_dim, out_dim, coeff=coeff, domain=domain,
                           codomain=codomain)


class SpectralNormLinear:
  """Spectral-norm dense layer (`lipschitz.py:27-99`): power iteration on
  the weight matrix with explicit u/v state; train forward does 1 iteration
  under stop_gradient, `converge` reprojects post-step."""

  def __init__(self, in_dim, out_dim, coeff=0.97, n_iterations=None,
               atol=1e-3, rtol=1e-3):
    self.in_dim, self.out_dim = in_dim, out_dim
    self.coeff = coeff
    self.n_iterations = n_iterations
    self.atol, self.rtol = atol, rtol

  def init(self, rng):
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    w = _kaiming_uniform(r1, (self.in_dim, self.out_dim), self.in_dim)
    b = _kaiming_uniform(r2, (self.out_dim,), self.in_dim)
    u = jax.random.normal(r3, (self.out_dim,))
    v = jax.random.normal(r4, (self.in_dim,))
    return {"w": w, "b": b, "u": u / jnp.linalg.norm(u),
            "v": v / jnp.linalg.norm(v)}

  def _power_iter(self, w, u, v, n_iter):
    # torch iterates v = normalize(W^T u), u = normalize(W v) on (out,in) W;
    # our w is (in, out): v_in = normalize(w u_out), u_out = normalize(w^T v)
    def body(i, carry):
      u, v = carry
      v = w @ u
      v = v / (jnp.linalg.norm(v) + 1e-12)
      u = w.T @ v
      u = u / (jnp.linalg.norm(u) + 1e-12)
      return u, v
    return lax.fori_loop(0, n_iter, body, (u, v))

  def normalized_weight(self, params, update: bool = False, n_iter: int = 1):
    w, u, v = params["w"], params["u"], params["v"]
    if update:
      u, v = self._power_iter(lax.stop_gradient(w), u, v, n_iter)
      u, v = lax.stop_gradient(u), lax.stop_gradient(v)
    sigma = v @ w @ u
    factor = jnp.maximum(1.0, sigma / self.coeff)
    return w / factor, {"u": u, "v": v}

  def apply(self, params, x, h=None, train: bool = False):
    w, new_uv = self.normalized_weight(params, update=train)
    return x @ w + params["b"], new_uv

  def converge(self, params, n_iter: int = 200):
    u, v = self._power_iter(params["w"], params["u"], params["v"], n_iter)
    return {**params, "u": u, "v": v}


class LipNormLinear:
  """Hard-normalized dense layer with a LEARNED scale
  (`lipschitz.py:371-412`): w_hat = w / ||w||_op * sigmoid(s) * coeff, s
  initialized to logit(||w_init||_op / coeff)."""

  def __init__(self, in_dim, out_dim, coeff=0.97, domain=float("inf"),
               codomain=float("inf"), local_constraint=True):
    self.in_dim, self.out_dim = in_dim, out_dim
    self.coeff = coeff
    self.local_constraint = local_constraint
    self.max_across_input_dims, self.norm_type = operator_norm_settings(
        domain, codomain)

  def _scale(self, w):
    axes = (1,) if self.max_across_input_dims else (0,)
    s = _lop_scale(w, self.norm_type, axes=axes)
    return jnp.max(s) if not self.local_constraint else s

  def init(self, rng):
    r1, r2 = jax.random.split(rng)
    w = _kaiming_uniform(r1, (self.in_dim, self.out_dim), self.in_dim)
    ratio = jnp.clip(self._scale(w) / self.coeff, 1e-6, 1 - 1e-6)
    return {"w": w,
            "b": _kaiming_uniform(r2, (self.out_dim,), self.in_dim),
            "s": jnp.log(ratio / (1.0 - ratio))}  # logit

  def normalized_weight(self, params):
    w = params["w"]
    scale = self._scale(w)
    mult = jax.nn.sigmoid(params["s"]) * self.coeff / (scale + 1e-12)
    if self.local_constraint and self.max_across_input_dims:
      return w * mult[:, None]
    if self.local_constraint:
      return w * mult[None, :]
    return w * mult

  def apply(self, params, x, h=None):
    return x @ self.normalized_weight(params) + params["b"]


class LipNormConv2d:
  """Conv variant of LipNorm (`lipschitz.py:415-463`), NHWC/HWIO."""

  def __init__(self, in_ch, out_ch, kernel_size, coeff=0.97,
               domain=float("inf"), codomain=float("inf"),
               local_constraint=True):
    self.in_ch, self.out_ch, self.k = in_ch, out_ch, kernel_size
    self.coeff = coeff
    self.local_constraint = local_constraint
    self.max_across_input_dims, self.norm_type = operator_norm_settings(
        domain, codomain)

  def _scale(self, w):
    axes = (0, 1, 3) if self.max_across_input_dims else (0, 1, 2)
    s = _lop_scale(w, self.norm_type, axes=axes)
    return jnp.max(s) if not self.local_constraint else s

  def init(self, rng):
    r1, r2 = jax.random.split(rng)
    fan_in = self.in_ch * self.k * self.k
    w = _kaiming_uniform(r1, (self.k, self.k, self.in_ch, self.out_ch),
                         fan_in)
    ratio = jnp.clip(self._scale(w) / self.coeff, 1e-6, 1 - 1e-6)
    return {"w": w, "b": _kaiming_uniform(r2, (self.out_ch,), fan_in),
            "s": jnp.log(ratio / (1.0 - ratio))}

  def normalized_weight(self, params):
    w = params["w"]
    scale = self._scale(w)
    mult = jax.nn.sigmoid(params["s"]) * self.coeff / (scale + 1e-12)
    if not self.local_constraint:
      return w * mult
    shape = ((1, 1, self.in_ch, 1) if self.max_across_input_dims
             else (1, 1, 1, self.out_ch))
    return w * mult.reshape(shape)

  def apply(self, params, x, h=None):
    w = self.normalized_weight(params)
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["b"]
