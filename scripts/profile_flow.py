"""Decompose the joint-step cost on the real chip.

Times, at bench geometry (batch 128, 16-16 wolf resflow):
  fwd          resflow fwdpass without log-det
  fwd+logdet   fwdpass with the Neumann estimator (no gradients)
  grad         full gradient of (sum z + sum logdet) w.r.t. flow params
Run: python scripts/profile_flow.py  (env: PF_BATCH, PF_UNROLL, PF_MP)
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
  from indm_tpu.configs import get_config
  from indm_tpu.flows.flow_model import create_flow_model, flow_forward

  parallel.enable_compilation_cache()
  batch = int(os.environ.get("PF_BATCH", 128))
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.flow.logdet_unroll = int(os.environ.get("PF_UNROLL", 8))
  cfg.flow.logdet_bf16 = bool(int(os.environ.get("PF_BF16", "1")))
  cfg.flow.mixed_precision = bool(int(os.environ.get("PF_MP", "1")))
  cfg.flow.logdet_pallas = bool(int(os.environ.get("PF_PALLAS", "0")))
  cfg.flow.remat_save_preacts = bool(int(os.environ.get("PF_PREACTS", "0")))
  cfg.flow.fused_block = bool(int(os.environ.get("PF_FUSED", "0")))

  fm = create_flow_model(cfg)
  params, buffers = fm.init(jax.random.PRNGKey(0))
  x = jnp.asarray(np.random.default_rng(0).uniform(
      -1, 1, (batch, 32, 32, 3)).astype(np.float32))
  rng = jax.random.PRNGKey(1)

  def fwd_only(p):
    z, _, _ = flow_forward(cfg, fm, p, buffers, x, rng=rng, train=True,
                           eval_logdet=False)
    return jnp.sum(z)

  def fwd_logdet(p):
    z, ld, _ = flow_forward(cfg, fm, p, buffers, x, rng=rng, train=True)
    return jnp.sum(z) + jnp.sum(ld)

  variants = {
      "fwd": jax.jit(fwd_only),
      "fwd+logdet": jax.jit(fwd_logdet),
      "grad": jax.jit(jax.grad(fwd_logdet)),
  }
  def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])   # host readback truly syncs

  for name, fn in variants.items():
    sync(fn(params))
    t0 = time.time()
    n = int(os.environ.get("PF_REPS", 5))
    out = None
    for _ in range(n):
      out = fn(params)
    sync(out)
    print(f"{name:12s}: {(time.time() - t0) / n * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
  main()
