"""Stacked fused iResBlock kernels — ONE Pallas call per scale.

`fused_block.py` fuses one iResBlock (forward + Neumann chain + J^T u,
and the complete analytic backward) into a kernel pair, but the scale's
16 blocks still run as a `lax.scan` of 16 separate `pallas_call`s. The
round-4 xprof attribution (PERF.md) put the per-block NON-kernel cost at
~0.8 ms (kernel dispatch + prologue/epilogue + the XLA glue between
calls): ~28 ms/step across both scales and directions at the flagship
geometry — pure overhead, no math.

This module moves the block loop INTO the kernel grid:

  grid = (batch_tiles, n_blocks)    # batch outer, blocks INNER

  * the carried activation lives in the `y` OUTPUT WINDOW: its block
    index is constant within a row (one window per batch tile), so the
    window stays VMEM-resident while the inner dimension walks the
    blocks — each step reads the window (previous block's output; the
    `x` input seeds it at j == 0), computes, and overwrites it. The
    window flushes once per row with the final block's output. The
    backward carries the cotangent through its `xbar` window the same
    way, walking blocks in reverse;
  * per-block weights are BlockSpec-indexed by the block id: they are
    re-fetched once per (batch tile, block) — ~1.2 GB/call at the
    flagship scale-1 geometry, ~1.5 ms of DMA fully overlapped with
    ~100 ms of compute — in exchange for eliminating 2 x n_blocks
    kernel dispatches per step;
  * weight-gradient accumulators are FULL-ARRAY output windows with a
    constant index map: resident in VMEM for the whole grid, accumulated
    with a first-row select (no zero-init pass), flushed to HBM exactly
    once at the end;
  * per-sample log-dets land in a full (n_blocks, B) SMEM output window
    (8 KB), written elementwise and summed (order-preserving) in XLA;
  * the forward emits each block's input (`xs_all`) and Neumann vector
    (`u_all`) — the same residuals the scan stacked — for the backward's
    in-VMEM recompute.

Numerics are IDENTICAL to the scanned `fused_block_apply` path: the same
per-block math runs on the same f32 carry with the same bf16 casts, the
same hoisted estimator randomness (vareps_all/n_all) and the same
Russian-roulette coefficient table. The reference semantics being
replaced remain `/root/reference/flow_models/resflow/layers/
iresblock.py:96-123` (estimator) and `resflow_.py:422-435` (the block
stack).

Geometry contract (same as fused_block.py): sin activation, 3-1-3 Lop
convs, narrow image channels (<33), wide intermediate (>=33); all
stacked blocks are pre-activated (`preact=True` — the special first
block of scale 1 keeps its single-block kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indm_tpu.ops.fused_block import (_bt_override, _patches_narrow,
                                      _sincos, _wgrad, pack_weights,
                                      unpack_wgrads)
from indm_tpu.ops.neumann_pallas import _apply_packed, _pick_batch_tile

_TWO_PI = 2.0 * np.pi


# ---------------------------------------------------------------------------
# forward kernel: grid (batch_tiles, n_blocks)
# ---------------------------------------------------------------------------


def _fwd_body(preact, has_hp, offset, table_len, cdt, bt, h, w, c,
              n_ref, table_ref, x_ref, eps_ref, *refs):
  if has_hp:
    hp_ref, refs = refs[0], refs[1:]
  (f0_ref, f1_ref, f2_ref, w2t_ref, w1t_ref, w0t_ref,
   b0_ref, b1_ref, b2_ref, y_ref, ld_ref, u_ref, xs_ref) = refs
  f32 = jnp.float32
  i = pl.program_id(0)
  j = pl.program_id(1)

  # y_ref doubles as the activation carry: constant block index within a
  # row keeps the window VMEM-resident across the inner (block) steps
  @pl.when(j == 0)
  def _seed():
    y_ref[:] = x_ref[:].astype(f32)

  x_f32 = y_ref[:]
  xs_ref[0] = x_f32                     # this block's input (bwd residual)
  xt = x_f32.astype(cdt)
  eps = eps_ref[0].astype(cdt)
  n_val = n_ref[0, j]

  # ---- forward: every sin/cos evaluated exactly once ----
  if preact:
    s0, d0 = _sincos(xt)
  else:
    d0 = None
    s0 = xt
  z1 = _apply_packed(s0, f0_ref[0], "narrow_in", f32).astype(cdt)
  z1 = z1 + b0_ref[:]
  s1, d1 = _sincos(z1)
  if has_hp:
    s1 = s1 + hp_ref[0][:, :, None, :]
  z2 = _apply_packed(s1, f1_ref[0], "mat", f32).astype(cdt)
  z2 = z2 + b1_ref[:]
  s2, d2 = _sincos(z2)
  g = _apply_packed(s2, f2_ref[0], "narrow_out", f32)       # f32
  g = g + b2_ref[:].astype(f32)
  y_ref[:] = xt.astype(f32) + g

  # ---- Neumann chain on the resident diagonals ----
  def jt(v):
    t = _apply_packed(v, w2t_ref[0], "narrow_in", f32).astype(cdt)
    t = t * d2
    t = _apply_packed(t, w1t_ref[0], "mat", f32).astype(cdt)
    t = t * d1
    t = _apply_packed(t, w0t_ref[0], "narrow_out", f32).astype(cdt)
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

  _, acc = lax.fori_loop(1, n_val + offset + 1, term,
                         (eps, jnp.zeros((bt, h, w, c), f32)),
                         unroll=False)
  u = eps_ref[0].astype(f32) + acc
  u_ref[0] = u

  # ---- one J^T u application + the Hutchinson dot ----
  jtu = jt(u.astype(cdt)).astype(f32)
  prod = jtu * eps_ref[0].astype(f32)
  for k in range(bt):
    ld_ref[j, i * bt + k] = jnp.sum(prod[k])


@functools.partial(
    jax.jit,
    static_argnames=("offset", "preact", "interpret", "batch_tile",
                     "compute_dtype"))
def fused_stack_fwd_pallas(x, vareps_all, n_all, table, f0p_all, f1_all,
                           f2p_all, w2tp_all, w1t_all, w0tp_all,
                           b0_all, b1_all, b2_all, hp_all, offset: int,
                           preact: bool, compute_dtype=jnp.bfloat16,
                           batch_tile: Optional[int] = None,
                           interpret: bool = False):
  """Returns (y [B,H,W,C] f32, ld_all [n,B] f32, u_all [n,B,H,W,C] f32,
  xs_all [n,B,H,W,C] f32)."""
  nb = f1_all.shape[0]
  b, h, w, c = x.shape
  bt = batch_tile or _bt_override(b, h * w) or _pick_batch_tile(b, h * w)
  grid = (b // bt, nb)
  has_hp = hp_all is not None

  body = functools.partial(_fwd_body, preact, has_hp, offset,
                           table.shape[-1], compute_dtype, bt, h, w, c)

  tile4 = pl.BlockSpec((bt, h, w, c), lambda i, j: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
  stack4 = pl.BlockSpec((1, bt, h, w, c), lambda i, j: (j, i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
  blk = lambda *shape: pl.BlockSpec(
      (1,) + tuple(shape),
      (lambda nd: lambda i, j: (j,) + (0,) * nd)(len(shape)),
      memory_space=pltpu.VMEM)
  in_specs = [
      pl.BlockSpec((1, nb), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
      pl.BlockSpec((1, table.shape[-1]), lambda i, j: (0, 0),
                   memory_space=pltpu.SMEM),
      tile4, stack4,
  ]
  args = [n_all.reshape(1, nb).astype(jnp.int32),
          jnp.asarray(table, jnp.float32).reshape(1, -1),
          x.astype(jnp.float32), vareps_all]
  if has_hp:
    # 4-D with a unit axis so the block's last-two dims are (1, idim)
    # (Mosaic's divisibility rule for VMEM block shapes)
    in_specs.append(pl.BlockSpec((1, bt, 1, hp_all.shape[-1]),
                                 lambda i, j: (j, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(hp_all.astype(compute_dtype).reshape(
        nb, b, 1, hp_all.shape[-1]))
  for m in (f0p_all, f1_all, f2p_all, w2tp_all, w1t_all, w0tp_all):
    m = m.astype(compute_dtype)
    in_specs.append(blk(*m.shape[1:]))
    args.append(m)
  for v in (b0_all, b1_all, b2_all):
    v = v.astype(compute_dtype).reshape(nb, 1, -1)
    in_specs.append(pl.BlockSpec((1, 1, v.shape[-1]),
                                 lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(v)

  y, ld, u_all, xs_all = pl.pallas_call(
      body,
      grid=grid,
      in_specs=in_specs,
      out_specs=(tile4,
                 # full-array SMEM window (8 KB), constant index: written
                 # elementwise across the whole grid, flushed once
                 pl.BlockSpec((nb, b), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM),
                 stack4, stack4),
      out_shape=(jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
                 jax.ShapeDtypeStruct((nb, b), jnp.float32),
                 jax.ShapeDtypeStruct((nb, b, h, w, c), jnp.float32),
                 jax.ShapeDtypeStruct((nb, b, h, w, c), jnp.float32)),
      compiler_params=pltpu.CompilerParams(
          # the carry-in-output-window + SMEM log-dets require strict
          # lexicographic execution
          dimension_semantics=("arbitrary", "arbitrary"),
          vmem_limit_bytes=64 * 1024 * 1024),
      interpret=interpret,
  )(*args)
  return y, ld, u_all, xs_all


# ---------------------------------------------------------------------------
# backward kernel: grid (batch_tiles, n_blocks), blocks replayed in reverse
# ---------------------------------------------------------------------------


def _bwd_body(preact, has_hp, cdt, bt, h, w, c, nb,
              xs_ref, eps_ref, u_ref, ybar_ref, lbar_ref, *refs):
  if has_hp:
    hp_ref, refs = refs[0], refs[1:]
  else:
    hp_ref = None
  (f0_ref, f1_ref, w2t_ref, w1t_ref, w0t_ref, b0_ref, b1_ref,
   xbar_ref, w0g_ref, w1g_ref, w2g_ref, b0g_ref, b1g_ref, b2g_ref,
   *rest) = refs
  hbar_ref = rest[0] if has_hp else None
  f32 = jnp.float32
  sig2 = np.float32(_TWO_PI * _TWO_PI)
  i = pl.program_id(0)
  j = pl.program_id(1)
  jb = pl.num_programs(1) - 1 - j       # block replayed at this step
  del nb
  first_row = i == 0

  def accum(ref, jbi, delta):
    """First-row select replaces a zero-init pass: the accumulator
    windows are full arrays with constant index maps (VMEM-resident for
    the whole grid, flushed once)."""
    cur = ref[pl.ds(jbi, 1)]
    ref[pl.ds(jbi, 1)] = jnp.where(first_row, delta, cur + delta)

  # xbar_ref doubles as the cotangent carry (constant index within a row)
  @pl.when(j == 0)
  def _seed():
    xbar_ref[:] = ybar_ref[:].astype(f32)

  ybar_f32 = xbar_ref[:]
  ybar = ybar_f32.astype(cdt)
  xt = xs_ref[0]
  eps = eps_ref[0].astype(cdt)
  v = (lbar_ref[:] * u_ref[0]).astype(cdt)

  # ---- primal recompute ----
  if preact:
    s0, d0 = _sincos(xt.astype(cdt))
  else:
    d0 = None
    s0 = xt.astype(cdt)
  z1 = _apply_packed(s0, f0_ref[0], "narrow_in", f32).astype(cdt)
  z1 = z1 + b0_ref[:]
  sin1, d1 = _sincos(z1)              # sigma(z1); sigma'' = -(2pi)^2 * it
  s1 = sin1 + hp_ref[0][:, :, None, :] if has_hp else sin1
  z2 = _apply_packed(s1, f1_ref[0], "mat", f32).astype(cdt)
  z2 = z2 + b1_ref[:]
  s2, d2 = _sincos(z2)

  # ---- tangent chain J eps (forward direction) ----
  t0 = d0 * eps if preact else eps
  a1 = _apply_packed(t0, f0_ref[0], "narrow_in", f32).astype(cdt)
  t1 = d1 * a1
  a2 = _apply_packed(t1, f1_ref[0], "mat", f32).astype(cdt)
  t2 = d2 * a2

  M = bt * h * w

  # ---- layer 2 ----
  g_pat = _patches_narrow(ybar, reverse=True, in_kernel=True)     # [M,9c]
  v_pat = _patches_narrow(v, reverse=True, in_kernel=True)
  accum(w2g_ref, jb, (_wgrad(s2.reshape(M, -1), g_pat)
                      + _wgrad(t2.reshape(M, -1), v_pat))[None])
  accum(b2g_ref, jb, jnp.sum(ybar.reshape(M, -1).astype(f32), axis=0,
                             keepdims=True))
  s2b = _apply_packed(ybar, w2t_ref[0], "narrow_in", f32).astype(cdt)
  t2b = _apply_packed(v, w2t_ref[0], "narrow_in", f32).astype(cdt)
  z2b = d2 * s2b - sig2 * s2 * (a2 * t2b)
  a2b = d2 * t2b

  # ---- layer 1 ----
  accum(w1g_ref, jb, (_wgrad(s1.reshape(M, -1), z2b.reshape(M, -1))
                      + _wgrad(t1.reshape(M, -1), a2b.reshape(M, -1)))
        [None])
  accum(b1g_ref, jb, jnp.sum(z2b.reshape(M, -1).astype(f32), axis=0,
                             keepdims=True))
  s1b = _apply_packed(z2b, w1t_ref[0], "mat", f32).astype(cdt)
  t1b = _apply_packed(a2b, w1t_ref[0], "mat", f32).astype(cdt)
  if has_hp:
    hbar_ref[0] = jnp.sum(s1b.reshape(bt, h * w, -1).astype(f32),
                          axis=1, keepdims=True)
  z1b = d1 * s1b - sig2 * sin1 * (a1 * t1b)
  a1b = d1 * t1b

  # ---- layer 0 ----
  s0_pat = _patches_narrow(s0, reverse=False, in_kernel=True)     # [M,9c]
  t0_pat = _patches_narrow(t0, reverse=False, in_kernel=True)
  accum(w0g_ref, jb, (_wgrad(s0_pat, z1b.reshape(M, -1))
                      + _wgrad(t0_pat, a1b.reshape(M, -1)))[None])
  accum(b0g_ref, jb, jnp.sum(z1b.reshape(M, -1).astype(f32), axis=0,
                             keepdims=True))
  s0b = _apply_packed(z1b, w0t_ref[0], "narrow_out", f32).astype(cdt)
  if preact:
    t0b = _apply_packed(a1b, w0t_ref[0], "narrow_out", f32).astype(cdt)
    xbar = (ybar_f32 + (d0 * s0b).astype(f32)
            - sig2 * (s0 * eps * t0b).astype(f32))
  else:
    xbar = ybar_f32 + s0b.astype(f32)
  xbar_ref[:] = xbar


@functools.partial(
    jax.jit,
    static_argnames=("preact", "interpret", "batch_tile", "compute_dtype"))
def fused_stack_bwd_pallas(xs_all, vareps_all, u_all, ybar, lbar,
                           f0p_all, f1_all, w2tp_all, w1t_all, w0tp_all,
                           b0_all, b1_all, hp_all, preact: bool,
                           compute_dtype=jnp.bfloat16,
                           batch_tile: Optional[int] = None,
                           interpret: bool = False):
  """Returns (xbar [B,H,W,C], w0g_packed [n,9c,idim], w1g [n,idim,idim],
  w2g_packed [n,idim,9c], b0g [n,idim], b1g [n,idim], b2g [n,c],
  hbar [n,B,idim] or None) — all f32, blocks in FORWARD order."""
  nb, b, h, w, c = xs_all.shape
  bt = batch_tile or _bt_override(b, h * w) or _pick_batch_tile(b, h * w)
  grid = (b // bt, nb)
  has_hp = hp_all is not None
  idim = f1_all.shape[-1]

  body = functools.partial(_bwd_body, preact, has_hp, compute_dtype,
                           bt, h, w, c, nb)

  tile4 = pl.BlockSpec((bt, h, w, c), lambda i, j: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
  # blocks replayed in reverse: inner step j touches block nb-1-j
  rstack4 = pl.BlockSpec((1, bt, h, w, c),
                         lambda i, j: (nb - 1 - j, i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
  rblk = lambda *shape: pl.BlockSpec(
      (1,) + tuple(shape),
      (lambda nd: lambda i, j: (nb - 1 - j,) + (0,) * nd)(len(shape)),
      memory_space=pltpu.VMEM)
  # full-array accumulator window, constant index: VMEM-resident for the
  # whole grid, accumulated in-place, flushed once
  acc = lambda *shape: pl.BlockSpec(
      tuple(shape), (lambda nd: lambda i, j: (0,) * nd)(len(shape)),
      memory_space=pltpu.VMEM)
  in_specs = [rstack4, rstack4, rstack4, tile4,
              pl.BlockSpec((bt, 1, 1, 1), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)]
  args = [xs_all, vareps_all, u_all, ybar.astype(jnp.float32),
          lbar.reshape(b, 1, 1, 1)]
  if has_hp:
    in_specs.append(pl.BlockSpec((1, bt, 1, hp_all.shape[-1]),
                                 lambda i, j: (nb - 1 - j, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(hp_all.astype(compute_dtype).reshape(
        nb, b, 1, hp_all.shape[-1]))
  for m in (f0p_all, f1_all, w2tp_all, w1t_all, w0tp_all):
    m = m.astype(compute_dtype)
    in_specs.append(rblk(*m.shape[1:]))
    args.append(m)
  for vv in (b0_all, b1_all):
    vv = vv.astype(compute_dtype).reshape(nb, 1, -1)
    in_specs.append(pl.BlockSpec((1, 1, vv.shape[-1]),
                                 lambda i, j: (nb - 1 - j, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(vv)

  out_specs = [tile4,
               acc(nb, 9 * c, idim), acc(nb, idim, idim),
               acc(nb, idim, 9 * c),
               acc(nb, idim), acc(nb, idim), acc(nb, c)]
  out_shape = [jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
               jax.ShapeDtypeStruct((nb, 9 * c, idim), jnp.float32),
               jax.ShapeDtypeStruct((nb, idim, idim), jnp.float32),
               jax.ShapeDtypeStruct((nb, idim, 9 * c), jnp.float32),
               jax.ShapeDtypeStruct((nb, idim), jnp.float32),
               jax.ShapeDtypeStruct((nb, idim), jnp.float32),
               jax.ShapeDtypeStruct((nb, c), jnp.float32)]
  if has_hp:
    out_specs.append(pl.BlockSpec((1, bt, 1, hp_all.shape[-1]),
                                  lambda i, j: (nb - 1 - j, i, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((nb, b, 1, hp_all.shape[-1]),
                                          jnp.float32))

  outs = pl.pallas_call(
      body,
      grid=grid,
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shape),
      compiler_params=pltpu.CompilerParams(
          # carry-in-output-window + resident accumulators -> strict order
          dimension_semantics=("arbitrary", "arbitrary"),
          vmem_limit_bytes=112 * 1024 * 1024),
      interpret=interpret,
  )(*args)
  xbar, w0g, w1g, w2g, b0g, b1g, b2g = outs[:7]
  hbar = outs[7][:, :, 0, :] if has_hp else None
  return xbar, w0g, w1g, w2g, b0g, b1g, b2g, hbar


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _pack_all(w0s, w1s, w2s, dtype):
  return jax.vmap(lambda a, b, c: pack_weights((a, b, c), dtype))(
      w0s, w1s, w2s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_stack_apply(cfg, x, w0s, w1s, w2s, b0s, b1s, b2s, hps,
                      vareps_all, n_all, table):
  """A whole scale's iResBlock stack in one fused kernel pair: returns
  (y, logdet_sum [B]).

  cfg = (offset, preact, dtype_name, interpret) — static. w0s/w1s/w2s are
  the stacked Lipschitz-NORMALIZED HWIO weights [n, ...] (f32 master);
  their cotangents chain through the vmapped `normalized_weight` in XLA.
  hps is the stacked [n, B, idim] conditioning projection (or None).
  vareps_all [n, B, H, W, C] and n_all [n] are the hoisted estimator
  draws (ScannedIResBlocks samples them batched, bit-identical to
  per-block sampling)."""
  y, ld_all, _, _ = _stack_fwd_impl(cfg, x, w0s, w1s, w2s, b0s, b1s, b2s,
                                    hps, vareps_all, n_all, table)
  return y, jnp.sum(ld_all, axis=0)


def _stack_fwd_impl(cfg, x, w0s, w1s, w2s, b0s, b1s, b2s, hps,
                    vareps_all, n_all, table):
  offset, preact, dtype_name, interpret = cfg
  cdt = jnp.dtype(dtype_name)
  f0p, f1, f2p, w2t_p, w1t, w0t_p = _pack_all(w0s, w1s, w2s, cdt)
  return fused_stack_fwd_pallas(
      x, vareps_all, n_all, table, f0p, f1, f2p, w2t_p, w1t, w0t_p,
      b0s, b1s, b2s, hps, offset=offset, preact=preact,
      compute_dtype=cdt, interpret=interpret)


def _stack_fwd(cfg, x, w0s, w1s, w2s, b0s, b1s, b2s, hps, vareps_all,
               n_all, table):
  y, ld_all, u_all, xs_all = _stack_fwd_impl(
      cfg, x, w0s, w1s, w2s, b0s, b1s, b2s, hps, vareps_all, n_all, table)
  res = (w0s, w1s, w2s, b0s, b1s, hps, vareps_all, u_all, xs_all, n_all,
         table)
  return (y, jnp.sum(ld_all, axis=0)), res


def _stack_bwd(cfg, res, cts):
  offset, preact, dtype_name, interpret = cfg
  del offset
  cdt = jnp.dtype(dtype_name)
  (w0s, w1s, w2s, b0s, b1s, hps, vareps_all, u_all, xs_all, n_all,
   table) = res
  ybar, ldbar = cts
  f0p, f1, _, w2t_p, w1t, w0t_p = _pack_all(w0s, w1s, w2s, cdt)
  c = w0s.shape[3]
  idim = w0s.shape[4]
  xbar, w0g_p, w1g, w2g_p, b0g, b1g, b2g, hbar = fused_stack_bwd_pallas(
      xs_all, vareps_all, u_all, ybar, ldbar, f0p, f1, w2t_p, w1t, w0t_p,
      b0s, b1s, hps, preact=preact, compute_dtype=cdt,
      interpret=interpret)
  w0g, w1g4, w2g = jax.vmap(
      lambda a, b_, c_: unpack_wgrads(a, b_, c_, c, idim))(w0g_p, w1g,
                                                           w2g_p)
  hbar_out = None if hps is None else hbar.astype(hps.dtype)
  return (xbar, w0g.astype(w0s.dtype), w1g4.astype(w1s.dtype),
          w2g.astype(w2s.dtype), b0g.astype(b0s.dtype),
          b1g.astype(b1s.dtype), b2g, hbar_out,
          jnp.zeros_like(vareps_all), np.zeros(n_all.shape,
                                               jax.dtypes.float0),
          jnp.zeros_like(table))


fused_stack_apply.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------------
# pure-jnp oracle (tests): per-block reference loop, no Pallas
# ---------------------------------------------------------------------------


def fused_stack_reference(x, w_all, b_all, hp_all, vareps_all, n_all,
                          table, offset, preact):
  """f32 reference: `fused_block_reference` looped over the stacked
  blocks (CPU parity target for the stacked kernels)."""
  from indm_tpu.ops.fused_block import fused_block_reference

  nb = w_all[0].shape[0]
  ld_sum = jnp.zeros((x.shape[0],), jnp.float32)
  for j in range(nb):
    nws = tuple(w[j] for w in w_all)
    bs = tuple(bb[j] for bb in b_all)
    hp = None if hp_all is None else hp_all[j]
    x, ld = fused_block_reference(x, nws, bs, hp, vareps_all[j],
                                  n_all[j], table, offset, preact)
    ld_sum = ld_sum + ld
  return x, ld_sum
