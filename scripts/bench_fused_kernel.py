"""Standalone timing for the fused block kernel pair (ops/fused_block.py).

Times the fwd kernel (and optionally bwd) at the shipped block geometries
across batch-tile choices and chain lengths, to locate in-kernel cost.

  python scripts/bench_fused_kernel.py [scale1|scale2] [fwd|bwd|both]
Env: BK_BT=comma list of batch tiles (default "1,2,4"), BK_N=sampled n
(default 2), BK_REPS (default 20), BK_BATCH (default 128).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np

  from indm_tpu import parallel
  from indm_tpu.ops import fused_block as fb

  parallel.enable_compilation_cache()
  geom = sys.argv[1] if len(sys.argv) > 1 else "scale1"
  which = sys.argv[2] if len(sys.argv) > 2 else "fwd"
  b = int(os.environ.get("BK_BATCH", 128))
  if geom == "scale1":
    h = w = 32
    c = 3
  else:
    h = w = 16
    c = 12
  idim = 512
  offset = 2
  n_val = int(os.environ.get("BK_N", 2))
  reps = int(os.environ.get("BK_REPS", 20))
  interpret = jax.default_backend() != "tpu"

  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32))
  eps = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
  w0 = jnp.asarray(rng.normal(size=(3, 3, c, idim)).astype(np.float32)) * 0.1
  w1 = jnp.asarray(rng.normal(size=(1, 1, idim, idim)).astype(np.float32)) * 0.04
  w2 = jnp.asarray(rng.normal(size=(3, 3, idim, c)).astype(np.float32)) * 0.1
  b0 = jnp.zeros((idim,))
  b1 = jnp.zeros((idim,))
  b2 = jnp.zeros((c,))
  n = jnp.asarray(n_val, jnp.int32)
  table = jnp.ones((1, 64), jnp.float32)

  f0p, f1, f2p, w2t_p, w1t, w0t_p = fb.pack_weights((w0, w1, w2),
                                                    jnp.bfloat16)

  skip = tuple(s for s in os.environ.get("BK_SKIP", "").split(",") if s)

  def run_fwd(bt):
    y, ld, u = fb.fused_block_fwd_pallas(
        x, eps, n, table, f0p, f1, f2p, w2t_p, w1t, w0t_p,
        b0, b1, b2, None, offset=offset, preact=True,
        batch_tile=bt, interpret=interpret, debug_skip=skip)
    return y, ld, u

  def run_bwd(bt, u):
    ybar = eps
    lbar = jnp.ones((b,), jnp.float32)
    return fb.fused_block_bwd_pallas(
        x, eps, u, ybar, lbar, f0p, f1, w2t_p, w1t, w0t_p,
        b0, b1, None, preact=True, batch_tile=bt,
        interpret=interpret, debug_skip=skip)

  def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    float(np.asarray(leaf).reshape(-1)[0])

  bts = [int(t) for t in os.environ.get("BK_BT", "1,2,4").split(",")]
  for bt in bts:
    if b % bt:
      continue
    try:
      out = run_fwd(bt)
      sync(out)
    except Exception as e:  # VMEM overflow etc.
      print(f"{geom} fwd bt={bt}: FAILED {type(e).__name__}: "
            f"{str(e)[:160]}", flush=True)
      continue
    if which in ("fwd", "both"):
      t0 = time.time()
      o = None
      for _ in range(reps):
        o = run_fwd(bt)
      sync(o)
      dt = (time.time() - t0) / reps * 1e3
      print(f"{geom} fwd bt={bt} n={n_val}: {dt:8.2f} ms", flush=True)
    if which in ("bwd", "both"):
      u = out[2]
      try:
        o = run_bwd(bt, u)
        sync(o)
      except Exception as e:
        print(f"{geom} bwd bt={bt}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        continue
      t0 = time.time()
      for _ in range(reps):
        o = run_bwd(bt, u)
      sync(o)
      dt = (time.time() - t0) / reps * 1e3
      print(f"{geom} bwd bt={bt}: {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
  main()
