"""Custom-VJP fused iResBlock body — one Pallas kernel pair for the whole
log-det block step.

The reference iResBlock training forward (`/root/reference/flow_models/
resflow/layers/iresblock.py:81-164` with the `neumann_logdet_estimator`
gradient trick at `:249-258`) costs, per block per step in the round-2
implementation:

  1. a stop-gradient forward to collect activation-derivative diagonals
     (sin + cos over the 512-wide intermediates),
  2. the Neumann J^T v chain (E[n]+2 terms),
  3. a second, differentiable forward (jax.vjp primal — sin again),
  4. one differentiable VJP J^T u (cos again),
  5. under scan remat, a THIRD forward in the backward recompute, plus the
     second-order backward of the logdet term (more sin/cos).

xprof (PERF.md round 2) put the scan body at 3.9 ms/block against a
1.5-1.7 ms roofline, with the gap dominated by repeated transcendentals
and fusion scheduling, not operand layout. This module removes the
duplication structurally:

  * `_fwd_kernel`: ONE in-VMEM forward evaluates each sin/cos exactly
    once, keeps the derivative diagonals resident, runs all sampled
    Neumann terms, applies the final J^T u, and emits (y, logdet, u).
  * `_bwd_kernel`: recomputes the forward in-VMEM (no HBM residuals — the
    round-2 measurement showed scan-stacked 512-wide residuals cost more
    than recompute) and evaluates the COMPLETE backward in one kernel:
    the standard path through g, and the second-order logdet path
    grad⟨l̄·u, J ε⟩ including the sigma''(z) = -(2π)^2 sigma(z) terms that
    torch autograd derives from the double-backward graph.

Because the kernels consume Lipschitz-NORMALIZED weights, the custom_vjp
returns cotangents w.r.t. those; XLA chains them through
`LopConv2d.normalized_weight` (weight-sized math) automatically.

Supported geometry = INDM's shipped flow: sin activation, 3-1-3 Lop convs
with narrow image channels (<33) and wide intermediate (>=33), bf16
compute (the TPU-first headline config). The f32-faithful configuration
keeps the round-2 XLA/while_loop path: its backward needs ~2x the VMEM
and does not fit a 16 MB core at batch-tile granularity of one 32x32
sample.

Backward math (all inside `_bwd_kernel`, per batch tile; sigma = sin
activation, D_i = diag(sigma'(z_i))):

  primal:  s0=sigma(x); z1=W0 s0+b0; s1=sigma(z1)+hp; z2=W1 s1+b1;
           s2=sigma(z2); g=W2 s2+b2; y=x+g
  logdet = <u, J eps>,  J = W2 D2 W1 D1 W0 D0  (u, eps constants)
  tangent: t0=D0 eps; a1=W0 t0; t1=D1 a1; a2=W1 t1; t2=D2 a2
  with v = lbar*u:
    gbar = ybar
    w2bar = s2^T (.) gbar + t2^T (.) v          (packed-conv outer products)
    s2bar = W2^T gbar;  t2bar = W2^T v
    z2bar = D2 s2bar + sigma''(z2) * (a2 * t2bar)
    a2bar = D2 t2bar
    w1bar = s1^T z2bar + t1^T a2bar
    s1bar = W1^T z2bar; t1bar = W1^T a2bar; hpbar = sum_hw s1bar
    z1bar = D1 s1bar + sigma''(z1) * (a1 * t1bar)
    a1bar = D1 t1bar
    w0bar = patches(s0)^T z1bar + patches(t0)^T a1bar
    s0bar = W0^T z1bar; t0bar = W0^T a1bar
    xbar = ybar + D0 s0bar + sigma''(x) * (eps * t0bar)     [preact]
         = ybar + s0bar                                     [no preact]
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indm_tpu.ops.neumann_pallas import (_apply_packed, _pick_batch_tile,
                                         transpose_conv_kernel)

_TWO_PI = 2.0 * np.pi

# Minimax fits for sin(u) (odd, deg 7) / cos(u) (even, deg 8) on
# [-pi/2, pi/2]; max abs err 2.3e-6 / 2.0e-7 over all f32 inputs after the
# period-1 range reduction (least-squares fit validated on a 2e5 grid).
_SIN_C = (-0.1666584, 0.00831458, -0.00018561)
_COS_C = (-0.499999464, 0.0416643988, -0.00138592018, 2.32717084e-05)

# Batch-tile override for on-device A/B experiments:
# INDM_FUSED_BT="1024:1,256:8" maps h*w -> batch tile (falls back to
# _pick_batch_tile when the hw key is absent or the tile doesn't divide b).
def _bt_override(b: int, hw: int):
  spec = os.environ.get("INDM_FUSED_BT", "")
  for entry in spec.split(","):
    if ":" in entry:
      k, v = entry.split(":")
      if int(k) == hw and b % int(v) == 0:
        return int(v)
  return None


# Mosaic's sin/cos intrinsics are ~6x slower than XLA:TPU's (measured: a
# 13.3 ms/block FIXED cost in the fused forward kernel, dominated by the
# four transcendental passes). The activation is sin(2*pi*z) — period 1 —
# so one round() range-reduction + short polynomials replaces both.
# INDM_SLOW_SINCOS=1 restores the intrinsics (A/B benching + debugging).
_USE_POLY = os.environ.get("INDM_SLOW_SINCOS", "0") != "1"


def _sincos(z):
  """Returns (sigma(z), sigma'(z)) = (sin(2 pi z)/(2 pi), cos(2 pi z)).

  Shared range reduction: with q = round(2z), s = z - q/2, u = 2 pi s in
  [-pi/2, pi/2]: sin(2 pi z) = (-1)^q sin(u), cos(2 pi z) = (-1)^q cos(u).
  """
  zf = z.astype(jnp.float32)
  if not _USE_POLY:
    return ((jnp.sin(_TWO_PI * zf) / _TWO_PI).astype(z.dtype),
            jnp.cos(_TWO_PI * zf).astype(z.dtype))
  q = jnp.round(2.0 * zf)
  s = zf - 0.5 * q
  u = _TWO_PI * s
  u2 = u * u
  sign = 1.0 - 2.0 * (q - 2.0 * jnp.floor(0.5 * q))
  sp = u * (1.0 + u2 * (_SIN_C[0] + u2 * (_SIN_C[1] + u2 * _SIN_C[2])))
  cp = 1.0 + u2 * (_COS_C[0] + u2 * (_COS_C[1]
                                     + u2 * (_COS_C[2] + u2 * _COS_C[3])))
  return ((sign * (1.0 / _TWO_PI)) * sp).astype(z.dtype), \
      (sign * cp).astype(z.dtype)


def _sin(z):
  return _sincos(z)[0]


def _cos(z):
  return _sincos(z)[1]


def _patches_narrow(x, reverse: bool, in_kernel: bool):
  """im2col rows of a NARROW (c < 33) NHWC tile for a SAME 3x3 conv:
  [N,H,W,C] -> [N*H*W, 9C] with tap t = dy*3+dx holding
  x[p + (dy-1, dx-1)] (forward-conv orientation) or, with `reverse`,
  x[p - (dy-1, dx-1)] (the orientation of conv WEIGHT gradients for a
  narrow-output conv). Assembled with zero-extend + 32-bit lane rolls —
  Mosaic cannot lane-concatenate narrow pieces."""
  n, h, w, c = x.shape
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  patches = None
  for dy in range(3):
    for dx in range(3):
      tap = dy * 3 + dx
      sy, sx = (dy, dx) if not reverse else (2 - dy, 2 - dx)
      piece = xp[:, sy:sy + h, sx:sx + w, :].reshape(-1, c)
      piece = jnp.pad(piece, ((0, 0), (0, 8 * c)))          # [M, 9C]
      if tap:
        roll = pltpu.roll if in_kernel else jnp.roll
        piece = roll(piece.astype(jnp.float32), c * tap,
                     axis=1).astype(x.dtype)
      patches = piece if patches is None else patches + piece
  return patches


def _wgrad(a, b):
  """[M, K1] x [M, K2] -> [K1, K2] contracting rows (f32 accumulate)."""
  return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)


def pack_weights(nws, dtype):
  """Normalized HWIO (3-1-3) conv weights -> the packed matrices both
  kernels consume. All packing is weight-sized XLA work and fully
  differentiable (the custom_vjp runs it inside fwd/bwd wrappers)."""
  w0, w1, w2 = nws
  if dtype is not None:
    w0, w1, w2 = (w.astype(dtype) for w in (w0, w1, w2))
  c = w0.shape[2]
  idim = w0.shape[3]
  f0p = w0.reshape(9 * c, idim)                     # narrow_in
  f1 = w1[0, 0]                                     # 1x1
  f2p = w2.transpose(2, 0, 1, 3).reshape(idim, 9 * c)   # narrow_out
  w2t = transpose_conv_kernel(w2)                   # [3,3,c,idim]
  w2t_p = w2t.reshape(9 * c, idim)                  # narrow_in
  w1t = w1[0, 0].T
  w0t = transpose_conv_kernel(w0)                   # [3,3,idim,c]
  w0t_p = w0t.transpose(2, 0, 1, 3).reshape(idim, 9 * c)  # narrow_out
  return f0p, f1, f2p, w2t_p, w1t, w0t_p


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_body(preact, has_hp, offset, table_len, cdt, bt, h, w, c,
              debug_skip, n_ref, table_ref, x_ref, eps_ref, *refs):
  if has_hp:
    hp_ref, refs = refs[0], refs[1:]
  (f0_ref, f1_ref, f2_ref, w2t_ref, w1t_ref, w0t_ref,
   b0_ref, b1_ref, b2_ref, y_ref, ld_ref, u_ref) = refs
  f32 = jnp.float32

  xt = x_ref[:]
  eps = eps_ref[:].astype(cdt)
  n_val = n_ref[0, 0]

  # debug_skip: STATIC timing-ablation knobs (scripts/bench_fused_kernel.py
  # only — never set on the training path). "sincos" replaces the activation
  # with a linear stand-in, "chain"/"jtu" skip estimator stages.
  sincos = ((lambda z: (z * jnp.asarray(0.159, z.dtype),
                        jnp.ones_like(z)))
            if "sincos" in debug_skip else _sincos)

  # ---- forward: every sin/cos evaluated exactly once ----
  if preact:
    xc = xt.astype(cdt)
    s0, d0 = sincos(xc)
  else:
    d0 = None
    s0 = xt.astype(cdt)
  z1 = _apply_packed(s0, f0_ref[:], "narrow_in", f32).astype(cdt)
  z1 = z1 + b0_ref[:]
  s1, d1 = sincos(z1)
  if has_hp:
    s1 = s1 + hp_ref[:][:, :, None, :]
  z2 = _apply_packed(s1, f1_ref[:], "mat", f32).astype(cdt)
  z2 = z2 + b1_ref[:]
  s2, d2 = sincos(z2)
  g = _apply_packed(s2, f2_ref[:], "narrow_out", f32)     # f32
  g = g + b2_ref[:].astype(f32)
  y_ref[:] = xt.astype(f32) + g

  # ---- Neumann chain on the resident diagonals ----
  def jt(v):
    t = _apply_packed(v, w2t_ref[:], "narrow_in", f32).astype(cdt)
    t = t * d2
    t = _apply_packed(t, w1t_ref[:], "mat", f32).astype(cdt)
    t = t * d1
    t = _apply_packed(t, w0t_ref[:], "narrow_out", f32).astype(cdt)
    if d0 is not None:
      t = t * d0
    return t

  def term(k, carry):
    v, acc = carry
    v = jt(v)
    sign = 1.0 - 2.0 * (k % 2).astype(f32)
    coeff = (n_val >= k - offset).astype(f32) / table_ref[
        0, jnp.minimum(k, table_len - 1)]
    return v, acc + sign * coeff * v.astype(f32)

  if "chain" in debug_skip:
    u = eps_ref[:].astype(f32)
  else:
    _, acc = lax.fori_loop(1, n_val + offset + 1, term,
                           (eps, jnp.zeros((bt, h, w, c), f32)),
                           unroll=False)
    u = eps_ref[:].astype(f32) + acc
  u_ref[:] = u

  # ---- one J^T u application + the Hutchinson dot ----
  if "jtu" in debug_skip:
    jtu = u
  else:
    jtu = jt(u.astype(cdt)).astype(f32)
  # per-sample scalar reductions into SMEM (the documented reduce-to-scalar
  # pattern; a (bt,1,1,1) keepdims VMEM reduction crashes Mosaic's layout
  # inference at some geometries)
  prod = jtu * eps_ref[:].astype(f32)
  ig = pl.program_id(0)
  for i in range(bt):
    ld_ref[0, ig * bt + i] = jnp.sum(prod[i])


@functools.partial(
    jax.jit,
    static_argnames=("offset", "preact", "interpret", "batch_tile",
                     "compute_dtype", "debug_skip"))
def fused_block_fwd_pallas(x, vareps, n, table, f0p, f1, f2p, w2t_p, w1t,
                           w0t_p, b0, b1, b2, hp, offset: int,
                           preact: bool, compute_dtype=jnp.bfloat16,
                           batch_tile: Optional[int] = None,
                           interpret: bool = False,
                           debug_skip: tuple = ()):
  """Returns (y [B,H,W,C] f32, logdet [B] f32, u [B,H,W,C] f32)."""
  b, h, w, c = x.shape
  bt = batch_tile or _bt_override(b, h * w) or _pick_batch_tile(b, h * w)
  grid = (b // bt,)
  has_hp = hp is not None

  body = functools.partial(_fwd_body, preact, has_hp, offset,
                           table.shape[-1], compute_dtype, bt, h, w, c,
                           debug_skip)

  tile4 = lambda: pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
  full = lambda m: pl.BlockSpec(m.shape, (lambda nd: lambda i:
                                          (0,) * nd)(m.ndim),
                                memory_space=pltpu.VMEM)
  in_specs = [
      pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
      pl.BlockSpec((1, table.shape[-1]), lambda i: (0, 0),
                   memory_space=pltpu.SMEM),
      tile4(), tile4(),
  ]
  args = [n.reshape(1, 1).astype(jnp.int32),
          jnp.asarray(table, jnp.float32).reshape(1, -1), x, vareps]
  if has_hp:
    in_specs.append(pl.BlockSpec((bt, 1, hp.shape[-1]),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(hp.reshape(b, 1, hp.shape[-1]).astype(compute_dtype))
  for m in (f0p, f1, f2p, w2t_p, w1t, w0t_p,
            b0.reshape(1, -1), b1.reshape(1, -1), b2.reshape(1, -1)):
    m = m.astype(compute_dtype)
    in_specs.append(full(m))
    args.append(m)

  y, ld, u = pl.pallas_call(
      body,
      grid=grid,
      in_specs=in_specs,
      out_specs=(tile4(),
                 # per-sample scalars: a FULL-array SMEM output (full
                 # blocks always satisfy the layout rule) indexed by
                 # program_id — (bt, ...) sub-blocks violate Mosaic's
                 # sublane divisibility for bt not in {8k, b}
                 pl.BlockSpec((1, b), lambda i: (0, 0),
                              memory_space=pltpu.SMEM),
                 tile4()),
      out_shape=(jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
                 jax.ShapeDtypeStruct((1, b), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)),
      compiler_params=pltpu.CompilerParams(
          # the shared SMEM output block forces ordered execution
          dimension_semantics=("arbitrary",),
          # the resident set (4 wide diagonals + chain temps + weights) at
          # one 32x32 sample per tile slightly exceeds the default 16 MB
          # scoped-vmem budget; raise it (v5e has headroom beyond the
          # conservative default)
          vmem_limit_bytes=64 * 1024 * 1024),
      interpret=interpret,
  )(*args)
  return y, ld[0], u


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _make_bwd_body(preact, has_hp, cdt, bt, h, w, c, debug_skip=()):
  f32 = jnp.float32
  sig2 = np.float32(_TWO_PI * _TWO_PI)
  # debug_skip: STATIC timing-ablation knobs (scripts/bench_fused_kernel.py
  # only). "sincos" = linear activation stand-in, "wgrad" = skip the
  # packed-conv weight-gradient outer products.
  sincos = ((lambda z: (z * jnp.asarray(0.159, z.dtype),
                        jnp.ones_like(z)))
            if "sincos" in debug_skip else _sincos)
  skip_wgrad = "wgrad" in debug_skip

  def body(x_ref, eps_ref, u_ref, ybar_ref, lbar_ref, *refs):
    if has_hp:
      hp_ref, refs = refs[0], refs[1:]
    else:
      hp_ref = None
    (f0_ref, f1_ref, w2t_ref, w1t_ref, w0t_ref, b0_ref, b1_ref,
     xbar_ref, w0g_ref, w1g_ref, w2g_ref, b0g_ref, b1g_ref, b2g_ref,
     *rest) = refs
    hbar_ref = rest[0] if has_hp else None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
      w0g_ref[:] = jnp.zeros_like(w0g_ref)
      w1g_ref[:] = jnp.zeros_like(w1g_ref)
      w2g_ref[:] = jnp.zeros_like(w2g_ref)
      b0g_ref[:] = jnp.zeros_like(b0g_ref)
      b1g_ref[:] = jnp.zeros_like(b1g_ref)
      b2g_ref[:] = jnp.zeros_like(b2g_ref)

    xt = x_ref[:]
    eps = eps_ref[:].astype(cdt)
    ybar = ybar_ref[:].astype(cdt)
    v = (lbar_ref[:] * u_ref[:]).astype(cdt)   # lbar is (bt,1,1,1)

    # ---- primal recompute ----
    if preact:
      xc = xt.astype(cdt)
      s0, d0 = sincos(xc)
    else:
      d0 = None
      s0 = xt.astype(cdt)
    z1 = _apply_packed(s0, f0_ref[:], "narrow_in", f32).astype(cdt)
    z1 = z1 + b0_ref[:]
    sin1, d1 = sincos(z1)               # sigma(z1); sigma'' = -(2pi)^2 * it
    s1 = sin1 + hp_ref[:][:, :, None, :] if has_hp else sin1
    z2 = _apply_packed(s1, f1_ref[:], "mat", f32).astype(cdt)
    z2 = z2 + b1_ref[:]
    s2, d2 = sincos(z2)

    # ---- tangent chain J eps (forward direction) ----
    t0 = d0 * eps if preact else eps
    a1 = _apply_packed(t0, f0_ref[:], "narrow_in", f32).astype(cdt)
    t1 = d1 * a1
    a2 = _apply_packed(t1, f1_ref[:], "mat", f32).astype(cdt)
    t2 = d2 * a2

    M = bt * h * w

    # ---- layer 2 ----
    # packed-conv weight grads: w2 packed [idim, 9c]; rows contract over M
    if not skip_wgrad:
      g_pat = _patches_narrow(ybar, reverse=True, in_kernel=True)  # [M,9c]
      v_pat = _patches_narrow(v, reverse=True, in_kernel=True)
    if not skip_wgrad:
      w2g_ref[:] += (_wgrad(s2.reshape(M, -1), g_pat)
                     + _wgrad(t2.reshape(M, -1), v_pat))
    b2g_ref[:] += jnp.sum(ybar.reshape(M, -1).astype(f32), axis=0,
                          keepdims=True)
    s2b = _apply_packed(ybar, w2t_ref[:], "narrow_in", f32).astype(cdt)
    t2b = _apply_packed(v, w2t_ref[:], "narrow_in", f32).astype(cdt)
    z2b = d2 * s2b - sig2 * s2 * (a2 * t2b)
    a2b = d2 * t2b

    # ---- layer 1 ----
    if not skip_wgrad:
      w1g_ref[:] += (_wgrad(s1.reshape(M, -1), z2b.reshape(M, -1))
                     + _wgrad(t1.reshape(M, -1), a2b.reshape(M, -1)))
    b1g_ref[:] += jnp.sum(z2b.reshape(M, -1).astype(f32), axis=0,
                          keepdims=True)
    s1b = _apply_packed(z2b, w1t_ref[:], "mat", f32).astype(cdt)
    t1b = _apply_packed(a2b, w1t_ref[:], "mat", f32).astype(cdt)
    if has_hp:
      hbar_ref[:] = jnp.sum(s1b.reshape(bt, h * w, -1).astype(f32),
                            axis=1, keepdims=True)
    z1b = d1 * s1b - sig2 * sin1 * (a1 * t1b)
    a1b = d1 * t1b

    # ---- layer 0 ----
    if not skip_wgrad:
      s0_pat = _patches_narrow(s0, reverse=False, in_kernel=True)  # [M,9c]
      t0_pat = _patches_narrow(t0, reverse=False, in_kernel=True)
    if not skip_wgrad:
      w0g_ref[:] += (_wgrad(s0_pat, z1b.reshape(M, -1))
                     + _wgrad(t0_pat, a1b.reshape(M, -1)))
    b0g_ref[:] += jnp.sum(z1b.reshape(M, -1).astype(f32), axis=0,
                          keepdims=True)
    s0b = _apply_packed(z1b, w0t_ref[:], "narrow_out", f32).astype(cdt)
    if preact:
      t0b = _apply_packed(a1b, w0t_ref[:], "narrow_out", f32).astype(cdt)
      xbar = (ybar_ref[:].astype(f32) + (d0 * s0b).astype(f32)
              - sig2 * (s0 * eps * t0b).astype(f32))
    else:
      xbar = ybar_ref[:].astype(f32) + s0b.astype(f32)
    xbar_ref[:] = xbar

  return body


@functools.partial(
    jax.jit,
    static_argnames=("preact", "interpret", "batch_tile", "compute_dtype",
                     "debug_skip"))
def fused_block_bwd_pallas(x, vareps, u, ybar, lbar, f0p, f1, w2t_p, w1t,
                           w0t_p, b0, b1, hp, preact: bool,
                           compute_dtype=jnp.bfloat16,
                           batch_tile: Optional[int] = None,
                           interpret: bool = False,
                           debug_skip: tuple = ()):
  """Returns (xbar, w0g_packed [9c,idim], w1g [idim,idim],
  w2g_packed [idim,9c], b0g [idim], b1g [idim], b2g [c], hbar [B,idim] or
  None) — all f32. Weight grads are in PACKED layout; `unpack_wgrads`
  restores HWIO."""
  b, h, w, c = x.shape
  bt = batch_tile or _bt_override(b, h * w) or _pick_batch_tile(b, h * w)
  grid = (b // bt,)
  has_hp = hp is not None
  idim = f1.shape[0]

  body = _make_bwd_body(preact, has_hp, compute_dtype, bt, h, w, c,
                        debug_skip)

  tile4 = lambda: pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
  full = lambda m: pl.BlockSpec(m.shape, (lambda nd: lambda i:
                                          (0,) * nd)(m.ndim),
                                memory_space=pltpu.VMEM)
  acc = lambda shape: pl.BlockSpec(shape, (lambda nd: lambda i:
                                           (0,) * nd)(len(shape)),
                                   memory_space=pltpu.VMEM)
  in_specs = [tile4(), tile4(), tile4(), tile4(),
              pl.BlockSpec((bt, 1, 1, 1), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)]
  args = [x, vareps, u, ybar, lbar.reshape(b, 1, 1, 1)]
  if has_hp:
    in_specs.append(pl.BlockSpec((bt, 1, hp.shape[-1]),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(hp.reshape(b, 1, hp.shape[-1]).astype(compute_dtype))
  for m in (f0p, f1, w2t_p, w1t, w0t_p, b0.reshape(1, -1),
            b1.reshape(1, -1)):
    m = m.astype(compute_dtype)
    in_specs.append(full(m))
    args.append(m)

  out_specs = [tile4(),
               acc((9 * c, idim)), acc((idim, idim)), acc((idim, 9 * c)),
               acc((1, idim)), acc((1, idim)), acc((1, c))]
  out_shape = [jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
               jax.ShapeDtypeStruct((9 * c, idim), jnp.float32),
               jax.ShapeDtypeStruct((idim, idim), jnp.float32),
               jax.ShapeDtypeStruct((idim, 9 * c), jnp.float32),
               jax.ShapeDtypeStruct((1, idim), jnp.float32),
               jax.ShapeDtypeStruct((1, idim), jnp.float32),
               jax.ShapeDtypeStruct((1, c), jnp.float32)]
  if has_hp:
    out_specs.append(pl.BlockSpec((bt, 1, hp.shape[-1]),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((b, 1, hp.shape[-1]),
                                          jnp.float32))

  outs = pl.pallas_call(
      body,
      grid=grid,
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      compiler_params=pltpu.CompilerParams(
          # weight-grad accumulators alias one block across all grid
          # cells -> the grid must execute in order
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=96 * 1024 * 1024),
      interpret=interpret,
  )(*args)
  xbar, w0g, w1g, w2g, b0g, b1g, b2g = outs[:7]
  hbar = outs[7][:, 0, :] if has_hp else None
  return (xbar, w0g, w1g, w2g, b0g[0], b1g[0], b2g[0], hbar)


def unpack_wgrads(w0g_p, w1g, w2g_p, c, idim):
  """Packed-layout weight grads -> HWIO (inverse of `pack_weights`)."""
  w0 = w0g_p.reshape(3, 3, c, idim)
  w1 = w1g.reshape(1, 1, idim, idim)
  w2 = w2g_p.reshape(idim, 3, 3, c).transpose(1, 2, 0, 3)
  return w0, w1, w2


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_block_apply(cfg, x, w0, w1, w2, b0, b1, b2, hp, vareps, n,
                      table):
  """One fused iResBlock step: returns (y, logdet).

  cfg = (offset, preact, dtype_name, interpret) — static.
  w0/w1/w2 are the Lipschitz-NORMALIZED HWIO weights (f32 master); their
  cotangents chain through `normalized_weight` in XLA. hp is the
  [B, idim] conditioning projection (or None)."""
  y, ld, _ = _fwd_impl(cfg, x, w0, w1, w2, b0, b1, b2, hp, vareps, n,
                       table)
  return y, ld


def _fwd_impl(cfg, x, w0, w1, w2, b0, b1, b2, hp, vareps, n, table):
  offset, preact, dtype_name, interpret = cfg
  cdt = jnp.dtype(dtype_name)
  f0p, f1, f2p, w2t_p, w1t, w0t_p = pack_weights((w0, w1, w2), cdt)
  x_in = x.astype(cdt)
  return fused_block_fwd_pallas(
      x_in, vareps, n, table, f0p, f1, f2p, w2t_p, w1t, w0t_p,
      b0, b1, b2, hp, offset=offset, preact=preact, compute_dtype=cdt,
      interpret=interpret)


def _fused_fwd(cfg, x, w0, w1, w2, b0, b1, b2, hp, vareps, n, table):
  y, ld, u = _fwd_impl(cfg, x, w0, w1, w2, b0, b1, b2, hp, vareps, n,
                       table)
  res = (x, w0, w1, w2, b0, b1, hp, vareps, u, n, table)
  return (y, ld), res


def _fused_bwd(cfg, res, cts):
  offset, preact, dtype_name, interpret = cfg
  cdt = jnp.dtype(dtype_name)
  x, w0, w1, w2, b0, b1, hp, vareps, u, n, table = res
  ybar, ldbar = cts
  f0p, f1, _, w2t_p, w1t, w0t_p = pack_weights((w0, w1, w2), cdt)
  c = w0.shape[2]
  idim = w0.shape[3]
  xbar, w0g_p, w1g, w2g_p, b0g, b1g, b2g, hbar = fused_block_bwd_pallas(
      x.astype(cdt), vareps, u, ybar, ldbar, f0p, f1, w2t_p, w1t, w0t_p,
      b0, b1, hp, preact=preact, compute_dtype=cdt, interpret=interpret)
  w0g, w1g4, w2g = unpack_wgrads(w0g_p, w1g, w2g_p, c, idim)
  zero_eps = jnp.zeros_like(vareps)
  zero_n = np.zeros(n.shape, jax.dtypes.float0)
  zero_table = jnp.zeros_like(table)
  hbar_out = None if hp is None else hbar.astype(hp.dtype)
  return (xbar, w0g.astype(w0.dtype), w1g4.astype(w1.dtype),
          w2g.astype(w2.dtype), b0g.astype(b0.dtype),
          b1g.astype(b1.dtype), b2g, hbar_out,
          zero_eps, zero_n, zero_table)


fused_block_apply.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# pure-jnp oracle (tests): identical math, no Pallas
# ---------------------------------------------------------------------------


def fused_block_reference(x, nws, bs, hp, vareps, n, table, offset,
                          preact):
  """f32 reference of the fused forward semantics (for CPU parity tests):
  returns (y, logdet) with the EXACT estimator contract of
  `IResBlock._logdetgrad` (neumann_grad, train)."""
  from indm_tpu.flows import lipschitz as lip

  # exact intrinsic sine: this oracle is the parity TARGET for the
  # polynomial in-kernel _sincos, so it must not share the approximation
  exact_sin = lambda t: jnp.sin(_TWO_PI * t) / _TWO_PI

  def g_fn(xx):
    t = exact_sin(xx) if preact else xx
    t = lip.lipschitz_conv_apply(t, nws[0], 3) + bs[0]
    t = exact_sin(t)
    if hp is not None:
      t = t + hp[:, None, None, :]
    t = lip.lipschitz_conv_apply(t, nws[1], 1) + bs[1]
    t = exact_sin(t)
    return lip.lipschitz_conv_apply(t, nws[2], 3) + bs[2]

  _, vjp = jax.vjp(g_fn, x)
  vv = vareps
  acc = jnp.zeros_like(vareps)
  for k in range(1, int(n) + offset + 1):
    (vv,) = vjp(vv)
    sign = -1.0 if k % 2 == 1 else 1.0
    coeff = float(int(n) >= k - offset) / float(table[min(int(k),
                                                          len(table) - 1)])
    acc = acc + sign * coeff * vv
  # the estimator treats the Neumann output as a CONSTANT left vector
  # (`iresblock.py:249-258`); only the final VJP is differentiable
  u = lax.stop_gradient(vareps + acc)
  g, vjp2 = jax.vjp(g_fn, x)
  (jtu,) = vjp2(u)
  logdet = jnp.sum((jtu * vareps).reshape(x.shape[0], -1), axis=-1)
  return x + g, logdet
