"""Standalone micro-bench/validation of the fused Neumann-chain kernel.

Runs the Pallas kernel on flagship shapes against the pure-XLA reference
chain, checks values, and times both. TPU by default; CPU with
JAX_PLATFORMS=cpu (interpret mode).

  python scripts/bench_neumann_kernel.py [scale1|scale2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  from indm_tpu.flows.resflow import _poisson_rcdf_table
  from indm_tpu.ops import neumann_pallas as npk

  try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
  except Exception:
    pass

  which = sys.argv[1] if len(sys.argv) > 1 else "scale1"
  b = int(os.environ.get("NK_BATCH", 128))
  if which == "scale1":
    h = w = 32
    c = 3
  else:
    h = w = 16
    c = 12
  idim = 512
  dt = jnp.bfloat16
  offset = 2
  n_terms = int(os.environ.get("NK_TERMS", 4))  # fixed n for timing

  rng = np.random.default_rng(0)
  eps = jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
  d2 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, idim)), dt)
  d1 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, idim)), dt)
  d0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), dt)
  w2t = jnp.asarray(rng.standard_normal((3, 3, idim, c)) * 0.05, dt)  # T(W2)
  w1t = jnp.asarray(rng.standard_normal((1, 1, idim, idim)) * 0.04, dt)
  w0t = jnp.asarray(rng.standard_normal((3, 3, c, idim)) * 0.05, dt)
  # application order: [T(W2) wide->..., wait: T(W2): c->512? no:
  # forward W2: 512->c, so transposed maps c->512. app order outermost
  # first: [T(W2) (c->512), T(W1) (512->512), T(W0) (512->c)]
  weights_t = [jnp.asarray(rng.standard_normal((3, 3, c, idim)) * 0.05, dt),
               w1t,
               jnp.asarray(rng.standard_normal((3, 3, idim, c)) * 0.05, dt)]
  dacts = [d2, d1, d0]
  table = jnp.asarray(_poisson_rcdf_table(2.0, offset))
  n = jnp.asarray(n_terms - offset, jnp.int32)

  interpret = jax.default_backend() != "tpu"
  print(f"backend={jax.default_backend()} shape=({b},{h},{w},{c}) "
        f"idim={idim} terms={n_terms} interpret={interpret}")

  # dacts/weights as ARGUMENTS, not closed-over constants (baked constants
  # inflate the program past the compile relay's request limit)
  jref = jax.jit(lambda e, d, wt: npk.neumann_chain_ref(
      e, d, wt, n, offset, table))
  jpal = jax.jit(lambda e, d, wt: npk.neumann_chain_pallas(
      e, d, wt, n, offset, table, preact=True, interpret=interpret))
  ref_fn = lambda e: jref(e, dacts, weights_t)
  pal_fn = lambda e: jpal(e, dacts, weights_t)

  a_ref = ref_fn(eps)
  a_pal = pal_fn(eps)
  err = float(jnp.max(jnp.abs(a_pal - a_ref)))
  scale = float(jnp.max(jnp.abs(a_ref))) + 1e-9
  print(f"max abs err: {err:.3e} (rel {err / scale:.3e})")

  def timeit(f, reps=20):
    f(eps).block_until_ready()
    t0 = time.time()
    out = None
    for _ in range(reps):
      out = f(eps)
    float(np.asarray(out[0, 0, 0, 0]))   # host readback sync
    return (time.time() - t0) / reps

  t_ref = timeit(ref_fn)
  t_pal = timeit(pal_fn)
  per_block = 31  # flagship chain count
  print(f"xla chain : {t_ref * 1e3:8.3f} ms  (x31 blocks: "
        f"{t_ref * per_block * 1e3:7.1f} ms/step)")
  print(f"pallas    : {t_pal * 1e3:8.3f} ms  (x31 blocks: "
        f"{t_pal * per_block * 1e3:7.1f} ms/step)  "
        f"speedup {t_ref / t_pal:.2f}x")


if __name__ == "__main__":
  main()
