"""upfirdn2d and StyleGAN2 FIR resampling, TPU-native.

The reference implements upsample-pad-FIR-downsample as a hand-written CUDA
kernel (`/root/reference/op/upfirdn2d_kernel.cu:50,109`) with a custom
double-backward chain (`op/upfirdn2d.py:19-142`). On TPU the whole op maps
onto ONE fused XLA HLO: `lax.conv_general_dilated` with `lhs_dilation=up`,
`window_strides=down` and explicit (possibly negative) padding — zero
insertion, padding/cropping, FIR filtering and stride-decimation execute as a
single convolution on the conv unit, and JAX AD automatically derives the
flipped-kernel transposed form the reference hand-codes at
`op/upfirdn2d.py:111-116`. A Pallas separable-FIR kernel is available as an
alternative backend (`indm_tpu.ops.upfirdn2d_pallas`).

Semantics oracle: `upfirdn2d_native`, a literal port of
`op/upfirdn2d.py:159-200` (NHWC).

All functions take NHWC images and 2-D FIR kernels.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def setup_kernel(k) -> np.ndarray:
  """Outer-product + normalize a (possibly 1-D separable) FIR kernel
  (`models/up_or_down_sampling.py:181-188`)."""
  k = np.asarray(k, dtype=np.float32)
  if k.ndim == 1:
    k = np.outer(k, k)
  k = k / np.sum(k)
  assert k.ndim == 2 and k.shape[0] == k.shape[1]
  return k


def upfirdn2d_native(x, kernel, up_x=1, up_y=1, down_x=1, down_y=1,
                     pad_x0=0, pad_x1=0, pad_y0=0, pad_y1=0):
  """Literal (slow) port of the CPU reference `upfirdn2d_native`
  (`op/upfirdn2d.py:159-200`), NHWC. Test oracle only."""
  b, in_h, in_w, c = x.shape
  kernel = jnp.asarray(kernel, x.dtype)
  kh, kw = kernel.shape
  # 1. zero-insertion upsample: each pixel followed by (up-1) zeros.
  out = x.reshape(b, in_h, 1, in_w, 1, c)
  out = jnp.pad(out, ((0, 0), (0, 0), (0, up_y - 1), (0, 0), (0, up_x - 1),
                      (0, 0)))
  out = out.reshape(b, in_h * up_y, in_w * up_x, c)
  # 2. pad (positive) then crop (negative).
  out = jnp.pad(out, ((0, 0),
                      (max(pad_y0, 0), max(pad_y1, 0)),
                      (max(pad_x0, 0), max(pad_x1, 0)), (0, 0)))
  out = out[:,
            max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
            max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
  # 3. correlate with the flipped kernel == true convolution.
  w = jnp.flip(kernel, (0, 1))[:, :, None, None]
  out = lax.conv_general_dilated(
      out, jnp.tile(w, (1, 1, 1, c)),
      window_strides=(1, 1), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
  # 4. decimate.
  out = out[:, ::down_y, ::down_x, :]
  out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
  out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
  assert out.shape == (b, out_h, out_w, c)
  return out


@functools.partial(jax.jit, static_argnames=("up", "down", "pad", "impl"))
def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0), impl: str = "xla"):
  """Fused upsample-pad-FIR-downsample (`op/upfirdn2d.py:145-156` API).

  x: [B, H, W, C]; kernel: [kh, kw]; `pad` = (pad0, pad1) applied to both
  spatial axes. The whole op is one `conv_general_dilated` call: XLA's
  lhs_dilation inserts (up-1) zeros *between* elements, so we extend the
  trailing pad by (up-1) to reproduce the reference's trailing zeros.
  """
  if impl == "pallas":
    from indm_tpu.ops import upfirdn2d_pallas
    return upfirdn2d_pallas.upfirdn2d_pallas(x, kernel, up=up, down=down,
                                             pad=pad)
  b, h, w_in, c = x.shape
  kernel = jnp.asarray(kernel, x.dtype)
  kh, kw = kernel.shape
  pad0, pad1 = pad
  wk = jnp.flip(kernel, (0, 1))[:, :, None, None]
  wk = jnp.tile(wk, (1, 1, 1, c))
  out = lax.conv_general_dilated(
      x, wk,
      window_strides=(down, down),
      padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
      lhs_dilation=(up, up),
      dimension_numbers=("NHWC", "HWIO", "NHWC"),
      feature_group_count=c)
  return out


# ---------------------------------------------------------------------------
# StyleGAN2-style resampling built on upfirdn2d
# (port of `models/up_or_down_sampling.py`, NHWC).
# ---------------------------------------------------------------------------


def naive_upsample_2d(x, factor: int = 2):
  b, h, w, c = x.shape
  x = x.reshape(b, h, 1, w, 1, c)
  x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
  return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x, factor: int = 2):
  b, h, w, c = x.shape
  x = x.reshape(b, h // factor, factor, w // factor, factor, c)
  return jnp.mean(x, axis=(2, 4))


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
  """`models/up_or_down_sampling.py:195-224`."""
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * (gain * (factor ** 2))
  p = k.shape[0] - factor
  return upfirdn2d(x, jnp.asarray(k), up=factor,
                   pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
  """`models/up_or_down_sampling.py:227-257`."""
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * gain
  p = k.shape[0] - factor
  return upfirdn2d(x, jnp.asarray(k), down=factor,
                   pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
  """Fused upsample + conv (`models/up_or_down_sampling.py:72-141`).

  x: [B, H, W, Cin]; w: [kh, kw, Cin, Cout] (HWIO). Implemented as a
  transposed conv (conv with lhs_dilation and the spatially-flipped,
  io-swapped kernel) followed by the FIR `upfirdn2d`.
  """
  assert w.ndim == 4
  convH, convW = w.shape[0], w.shape[1]
  assert convH == convW
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * (gain * (factor ** 2))
  p = (k.shape[0] - factor) - (convW - 1)

  # The reference spatially flips + io-swaps the weight to feed
  # `F.conv_transpose2d` (`up_or_down_sampling.py:124-129`); rewriting the
  # transposed conv as a dilated conv un-does both, so the equivalent single
  # dilated conv uses the ORIGINAL HWIO weight with padding (convH-1,convH-1)
  # (stride=factor, output_padding=0 — note the shipped reference mangles
  # stride into a 4-list at `up_or_down_sampling.py:117`, which would raise
  # in torch; we implement the intended StyleGAN2/TF semantics).
  x = lax.conv_general_dilated(
      x, w,
      window_strides=(1, 1),
      padding=((convH - 1, convH - 1), (convW - 1, convW - 1)),
      lhs_dilation=(factor, factor),
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
  return upfirdn2d(x, jnp.asarray(k),
                   pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
  """Fused conv + downsample (`models/up_or_down_sampling.py:144-178`).

  x: [B, H, W, Cin]; w: [kh, kw, Cin, Cout] (HWIO).
  """
  convH, convW = w.shape[0], w.shape[1]
  assert convH == convW
  if k is None:
    k = [1] * factor
  k = setup_kernel(k) * gain
  p = (k.shape[0] - factor) + (convW - 1)
  x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
  return lax.conv_general_dilated(
      x, w, window_strides=(factor, factor), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))
