"""Compare implementations of the narrow-channel 3x3 SAME convs on TPU.

The 3-1-3 Lipschitz nets bottleneck on (3<->512)-channel convs; xprof shows
XLA laying the narrow NHWC operands out batch-minor and spending ~2 ms per
conv at batch 128 (20x off roofline). Candidates:

  dot_trick   the shipping `_conv3x3_narrow_in/_out` (reshape+dot+shifts)
  direct      lax.conv_general_dilated
  pallas      per-batch-tile kernel (roll-assembled patches / packed taps)

  python scripts/bench_narrow_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(f, x, reps=100):
  # sync via a SINGLE-element readback (a full-tensor readback through the
  # relay tunnel costs seconds and poisons the timing)
  sync = jax.jit(lambda o: o.reshape(-1)[0] * 1.0)
  float(np.asarray(sync(f(x))))
  t0 = time.time()
  out = None
  for _ in range(reps):
    out = f(x)
  float(np.asarray(sync(out)))
  return (time.time() - t0) / reps * 1e3


def pallas_conv(x, w, kind):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from indm_tpu.ops.neumann_pallas import (_apply_packed, _pack_weight,
                                           _pick_batch_tile)
  b, h, ww_, cin = x.shape
  cout = w.shape[-1]
  k, wmat = _pack_weight(w)
  assert k == kind, (k, kind)
  bt = int(os.environ.get("NC_BT", 0)) or _pick_batch_tile(b, h * ww_)

  def body(x_ref, w_ref, o_ref):
    o_ref[:] = _apply_packed(x_ref[:], w_ref[:], kind,
                             jnp.float32).astype(x_ref.dtype)

  return pl.pallas_call(
      body,
      grid=(b // bt,),
      in_specs=[pl.BlockSpec((bt, h, ww_, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wmat.shape,
                             (lambda nd: lambda i: (0,) * nd)(wmat.ndim),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((bt, h, ww_, cout), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, h, ww_, cout), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("parallel",)),
      interpret=jax.default_backend() != "tpu",
  )(x, wmat)


def main():
  from indm_tpu import parallel
  from indm_tpu.flows.lipschitz import (_conv3x3_narrow_in,
                                        _conv3x3_narrow_out)
  parallel.enable_compilation_cache()
  b = int(os.environ.get("NC_BATCH", 128))
  hw = int(os.environ.get("NC_HW", 32))
  c, idim = 3, 512
  dt = jnp.bfloat16
  rng = np.random.default_rng(0)
  x_n = jnp.asarray(rng.standard_normal((b, hw, hw, c)), dt)
  x_w = jnp.asarray(rng.standard_normal((b, hw, hw, idim)), dt)
  w_in = jnp.asarray(rng.standard_normal((3, 3, c, idim)) * 0.05, dt)
  w_out = jnp.asarray(rng.standard_normal((3, 3, idim, c)) * 0.05, dt)

  conv = lambda xx, ww: lax.conv_general_dilated(
      xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

  cases = {
      f"narrow_in  ({c}->{idim}) dot_trick":
          (jax.jit(lambda xx: _conv3x3_narrow_in(xx, w_in)), x_n),
      f"narrow_in  ({c}->{idim}) direct":
          (jax.jit(lambda xx: conv(xx, w_in)), x_n),
      f"narrow_in  ({c}->{idim}) pallas":
          (jax.jit(lambda xx: pallas_conv(xx, w_in, "narrow_in")), x_n),
      f"narrow_out ({idim}->{c}) dot_trick":
          (jax.jit(lambda xx: _conv3x3_narrow_out(xx, w_out)), x_w),
      f"narrow_out ({idim}->{c}) direct":
          (jax.jit(lambda xx: conv(xx, w_out)), x_w),
      f"narrow_out ({idim}->{c}) pallas":
          (jax.jit(lambda xx: pallas_conv(xx, w_out, "narrow_out")), x_w),
  }
  ref = {}
  for name, (f, xx) in cases.items():
    ms = timeit(f, xx)
    key = name.split()[0]
    out = np.asarray(f(xx), np.float32)
    if key not in ref:
      ref[key] = out
    err = np.max(np.abs(out - ref[key]))
    print(f"{name:36s}: {ms:8.3f} ms   (max dev vs first: {err:.2e})",
          flush=True)


if __name__ == "__main__":
  main()
