"""Pallas TPU kernel for upfirdn2d (separable FIR resampling).

TPU-native counterpart of the reference CUDA kernel
(`/root/reference/op/upfirdn2d_kernel.cu:50,109`). One grid step processes
one image in VMEM: pad -> separable row FIR -> separable column FIR ->
decimate, pure VPU code built from STATIC strided slices (no scatter):

  * up == 1 (plain FIR / decimation): out[o] = sum_t k~[t] x_pad[o*down+t]
    — a weighted sum of `kw` strided slices;
  * up == 2, down == 1 (zero-stuffed upsampling): 2-phase polyphase — each
    output parity is a small correlation with the even/odd tap subset,
    interleaved by a stack+reshape.

These cover every configuration the models use (`upsample_2d`,
`downsample_2d`, and the up=1 FIR inside the fused conv resamplers).
The default production path remains the single fused XLA dilated conv
(`indm_tpu.ops.upfirdn2d`, impl='xla'); this kernel is the hand-written
alternative and a fusion site for future elementwise chains. Oracle-tested
against `upfirdn2d_native`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_slice(x, axis, start, stop, step=1):
  idx = [slice(None)] * x.ndim
  idx[axis] = slice(start, stop, step)
  return x[tuple(idx)]


def _fir_down_1d(x, taps, down, pad0, pad1, axis):
  """up=1 path: pad then weighted sum of strided slices (convolution =>
  correlate with flipped taps)."""
  kw = len(taps)
  n_in = x.shape[axis]
  n_out = (n_in + pad0 + pad1 - kw) // down + 1
  pad_cfg = [(0, 0)] * x.ndim
  pad_cfg[axis] = (pad0, pad1)
  xp = jnp.pad(x, pad_cfg)
  out = None
  for t in range(kw):
    c = float(taps[kw - 1 - t])
    piece = _axis_slice(xp, axis, t, t + (n_out - 1) * down + 1, down)
    out = piece * c if out is None else out + piece * c
  return out


def _fir_up2_1d(x, taps, pad0, pad1, axis):
  """up=2, down=1 polyphase: out[o] = sum_t k~[t] xv[o - pad0 + t] where
  xv is the zero-stuffed input (xv[2i] = x[i])."""
  kw = len(taps)
  n_in = x.shape[axis]
  n_out = 2 * n_in + pad0 + pad1 - kw + 1
  kflip = [float(taps[kw - 1 - t]) for t in range(kw)]
  # generous zero padding of the input so all phase reads are in range
  extra = kw
  pad_cfg = [(0, 0)] * x.ndim
  pad_cfg[axis] = (extra, extra)
  xp = jnp.pad(x, pad_cfg)

  phases = []
  n_half = (n_out + 1) // 2
  for r in range(2):
    acc = None
    for t in range(kw):
      v0 = r - pad0 + t            # virtual index at o = r
      if v0 % 2 != 0:
        continue                   # zero-stuffed sample
      i0 = v0 // 2 + extra         # into padded input, o advances i by 1
      piece = _axis_slice(xp, axis, i0, i0 + n_half)
      acc = piece * kflip[t] if acc is None else acc + piece * kflip[t]
    if acc is None:
      shape = list(x.shape)
      shape[axis] = n_half
      acc = jnp.zeros(shape, x.dtype)
    phases.append(acc)
  # interleave the two phases along `axis`
  stacked = jnp.stack(phases, axis=axis + 1)
  shape = list(x.shape)
  shape[axis] = 2 * n_half
  out = stacked.reshape(shape)
  return _axis_slice(out, axis, 0, n_out)


def _upfirdn_1d(x, taps, up, down, pad0, pad1, axis):
  if up == 1:
    return _fir_down_1d(x, taps, down, pad0, pad1, axis)
  if up == 2 and down == 1:
    return _fir_up2_1d(x, taps, pad0, pad1, axis)
  raise NotImplementedError(
      f"pallas upfirdn2d supports up in {{1,2}}, down with up==1; got "
      f"up={up}, down={down}")


def _separate(k2d: np.ndarray):
  if np.linalg.matrix_rank(k2d, tol=1e-6) != 1:
    raise NotImplementedError("pallas backend requires separable kernels")
  u, s, vt = np.linalg.svd(k2d)
  k_col = u[:, 0] * np.sqrt(s[0])
  k_row = vt[0] * np.sqrt(s[0])
  # fix sign so taps are positive-sum (FIR kernels are nonnegative)
  if k_col.sum() < 0:
    k_col, k_row = -k_col, -k_row
  return k_col.astype(np.float32), k_row.astype(np.float32)


def upfirdn2d_pallas(x, kernel, up: int = 1, down: int = 1,
                     pad: Tuple[int, int] = (0, 0), interpret: bool = False):
  """x: [B, H, W, C]; kernel: [kh, kw] separable. Matches
  `upfirdn2d_native` semantics."""
  b, h, w, c = x.shape
  k2d = np.asarray(kernel, np.float32)
  k_col, k_row = _separate(k2d)
  kh, kw = k2d.shape
  pad0, pad1 = pad
  out_h = (h * up + pad0 + pad1 - kh) // down + 1
  out_w = (w * up + pad0 + pad1 - kw) // down + 1

  def body(x_ref, o_ref):
    xi = x_ref[0]
    y = _upfirdn_1d(xi, list(k_col), up, down, pad0, pad1, axis=0)
    y = _upfirdn_1d(y, list(k_row), up, down, pad0, pad1, axis=1)
    o_ref[0] = y

  return pl.pallas_call(
      body,
      grid=(b,),
      in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((1, out_h, out_w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
      interpret=interpret,
  )(x)
