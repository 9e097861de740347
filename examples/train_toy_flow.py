"""Standalone 2-D residual-flow trainer on toy densities.

The TPU-native equivalent of the reference's standalone trainer
(`flow_models/resflow/resflow.py` + `toy_data.py` + `visualize_flow.py`):
maximum-likelihood training of an FC iResBlock chain on a 2-D toy dataset,
with a density PNG rendered at the end.

  python examples/train_toy_flow.py --data 8gaussians --steps 500
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from indm_tpu.flows import resflow as rf
from indm_tpu.utils import toy_data as td


def build_flow(n_blocks: int, dim: int = 2, idim: int = 64):
  layers = []
  for _ in range(n_blocks):
    nnet = rf.LipschitzFCNet((1, 1, dim), idim, nhidden=2, coeff=0.9,
                             act="swish")
    layers.append(rf.IResBlock(nnet, n_dist="geometric", n_exact_terms=2,
                               unroll_terms=6))
    layers.append(rf.ActNorm2d(dim))
  return rf.SequentialFlow(layers)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--data", default="8gaussians", choices=td.TOY_DATASETS)
  p.add_argument("--steps", type=int, default=500)
  p.add_argument("--batch", type=int, default=256)
  p.add_argument("--lr", type=float, default=1e-3)
  p.add_argument("--blocks", type=int, default=4)
  p.add_argument("--out", default="toy_density.png")
  args = p.parse_args()

  flow = build_flow(args.blocks)
  params = flow.init(jax.random.PRNGKey(0))
  opt = optax.adam(args.lr)
  opt_state = opt.init(params)

  def nll(params, x, rng):
    # x 2-D points as (B,1,1,2) images for the FC wrapper
    x4 = x.reshape(-1, 1, 1, 2)
    z, neg_logdet = flow.forward(params, x4, jnp.zeros((x.shape[0],)),
                                 rng=rng, train=True)
    z = z.reshape(-1, 2)
    logpz = -0.5 * jnp.sum(z ** 2, axis=1) - math.log(2 * math.pi)
    # forward threads logpx - logdet; neg_logdet holds -sum(logdetgrad)
    return -jnp.mean(logpz - neg_logdet)

  @jax.jit
  def step(params, opt_state, x, rng):
    loss, g = jax.value_and_grad(nll)(params, x, rng)
    updates, opt_state = opt.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  rng = np.random.default_rng(0)
  key = jax.random.PRNGKey(1)
  for i in range(args.steps):
    x = jnp.asarray(td.inf_train_gen(args.data, args.batch, rng=rng))
    key, sub = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, x, sub)
    if i % 100 == 0 or i == args.steps - 1:
      print(f"step {i}: nll {float(loss):.4f}")

  def logprob(pts):
    x4 = jnp.asarray(pts, jnp.float32).reshape(-1, 1, 1, 2)
    z, neg_logdet = flow.forward(params, x4, jnp.zeros((len(pts),)),
                                 rng=jax.random.PRNGKey(0), train=False)
    z = z.reshape(-1, 2)
    logpz = -0.5 * jnp.sum(z ** 2, axis=1) - math.log(2 * math.pi)
    return np.asarray(logpz - neg_logdet)

  td.save_density_png(args.out, logprob)
  print(f"density rendered to {args.out}")


if __name__ == "__main__":
  main()
