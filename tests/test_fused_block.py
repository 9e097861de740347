"""Custom-VJP fused iResBlock kernel pair vs the XLA estimator path.

Oracles, strongest first:
  1. `IResBlock._logdetgrad` default path (repeated jax.vjp + one
     differentiable VJP — the round-2 golden-tested semantics);
  2. `fused_block_reference` (pure-jnp transcription of the kernel math);
  3. the kernels themselves in interpret mode (the driver benches the
     compiled versions on the real chip).

Gradient parity is the load-bearing check: the backward kernel implements
the full second-order logdet backward by hand (sigma'' terms), which the
XLA path gets from jax.grad-of-vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows.resflow import (IResBlock, LipschitzNNet,
                                    _poisson_rcdf_table)
from indm_tpu.ops import fused_block as fb

# fused_chain_ok requires idim >= 33 and in_ch < 33
_IN, _IDIM, _HW, _B = 3, 64, 8, 4


def _setup(preact=True, cond=True, seed=0):
  nnet = LipschitzNNet(_IN, _IDIM, kernels=(3, 1, 3), coeff=0.98,
                       act="sin", cond_dim=16 if cond else None,
                       preact=preact)
  params = nnet.init(jax.random.PRNGKey(seed))
  x = jax.random.normal(jax.random.PRNGKey(seed + 1), (_B, _HW, _HW, _IN))
  h = (jax.random.normal(jax.random.PRNGKey(seed + 2), (_B, 16)) * 0.3
       if cond else None)
  eps = jax.random.normal(jax.random.PRNGKey(seed + 3), x.shape)
  return nnet, params, x, h, eps


def _inputs(nnet, params, h):
  nws = tuple(c.normalized_weight(p)
              for c, p in zip(nnet.convs, params))
  bs = tuple(p["b"] for p in params)
  hp = None
  if nnet.convs[1].cond_dim is not None and h is not None:
    hp = h @ params[1]["h_w"] + params[1]["h_b"]
  return nws, bs, hp


@pytest.mark.parametrize("preact,cond", [(True, True), (True, False),
                                         (False, False)])
@pytest.mark.parametrize("n", [0, 3])
def test_fwd_kernel_matches_reference(preact, cond, n):
  nnet, params, x, h, eps = _setup(preact=preact, cond=cond)
  offset = 2
  table = _poisson_rcdf_table(2.0, offset)
  nws, bs, hp = _inputs(nnet, params, h)

  y_ref, ld_ref = fb.fused_block_reference(
      x, nws, bs, hp, eps, n, table, offset, preact)

  cfg = (offset, preact, "float32", True)   # interpret mode, f32
  y, ld = fb.fused_block_apply(cfg, x, *nws, *bs, hp, eps,
                               jnp.asarray(n, jnp.int32),
                               jnp.asarray(table))
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref), rtol=1e-4,
                             atol=1e-4)


@pytest.mark.parametrize("preact,cond", [(True, True), (True, False),
                                         (False, False)])
def test_bwd_kernel_gradients_match_autodiff(preact, cond):
  """grad of (a.y_loss + b.logdet_loss) wrt x, weights, biases, hp must
  match jax.grad through the pure-jnp reference."""
  nnet, params, x, h, eps = _setup(preact=preact, cond=cond)
  offset, n = 2, 2
  table = _poisson_rcdf_table(2.0, offset)
  nws, bs, hp = _inputs(nnet, params, h)
  n_arr = jnp.asarray(n, jnp.int32)
  table_arr = jnp.asarray(table)

  def loss_ref(x, nws, bs, hp):
    y, ld = fb.fused_block_reference(x, nws, bs, hp, eps, n, table,
                                     offset, preact)
    return jnp.sum(y * jnp.cos(y)) * 0.1 + jnp.sum(ld * 0.7)

  def loss_fused(x, nws, bs, hp):
    cfg = (offset, preact, "float32", True)
    y, ld = fb.fused_block_apply(cfg, x, *nws, *bs, hp, eps, n_arr,
                                 table_arr)
    return jnp.sum(y * jnp.cos(y)) * 0.1 + jnp.sum(ld * 0.7)

  g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, nws, bs, hp)
  g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, nws, bs, hp)
  for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                  jax.tree_util.tree_leaves(g_fused)):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                               atol=2e-4)


def test_iresblock_fused_matches_default_forward():
  """IResBlock(fused_block=True) reproduces the default path's (y, logdet)
  for the same rng, and its parameter/x/h grads match."""
  nnet, params_n, x, h, _ = _setup()
  params = {"nnet": params_n}
  blk_ref = IResBlock(nnet, n_dist="poisson")
  blk_fused = IResBlock(nnet, n_dist="poisson", fused_block=True)
  lp0 = jnp.zeros((x.shape[0],))

  for seed in (3, 9):
    rng = jax.random.PRNGKey(seed)
    y_ref, lp_ref = blk_ref.forward(params, x, lp0, h=h, rng=rng,
                                    train=True)
    y_f, lp_f = blk_fused.forward(params, x, lp0, h=h, rng=rng,
                                  train=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)

  def loss(p, hh, block):
    y, lp = block.forward(p, x, lp0, h=hh, rng=jax.random.PRNGKey(3),
                          train=True)
    return jnp.mean(lp) + 0.05 * jnp.sum(y ** 2)

  g_ref = jax.grad(loss, argnums=(0, 1))(params, h, blk_ref)
  g_f = jax.grad(loss, argnums=(0, 1))(params, h, blk_fused)
  for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                  jax.tree_util.tree_leaves(g_f)):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                               atol=2e-4)


def test_fused_eval_path_unchanged():
  """fused_block only engages at train time; eval uses the basic
  estimator identically to the default block."""
  nnet, params_n, x, h, _ = _setup()
  params = {"nnet": params_n}
  rng = jax.random.PRNGKey(5)
  lp0 = jnp.zeros((x.shape[0],))
  y_ref, lp_ref = IResBlock(nnet).forward(params, x, lp0, h=h, rng=rng,
                                          train=False)
  y_f, lp_f = IResBlock(nnet, fused_block=True).forward(
      params, x, lp0, h=h, rng=rng, train=False)
  np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=1e-6)
  np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                             atol=1e-6)


def test_fused_scan_stack_end_to_end():
  """ScannedIResBlocks(remat=False) + fused blocks: value_and_grad of a
  small 2-block stack matches the default remat stack."""
  from indm_tpu.flows.resflow import ScannedIResBlocks

  nnet, params_n, x, h, _ = _setup(cond=False)
  blk_ref = IResBlock(nnet, n_dist="poisson")
  blk_f = IResBlock(nnet, n_dist="poisson", fused_block=True)
  stack_ref = ScannedIResBlocks(blk_ref, 2, remat=True)
  stack_f = ScannedIResBlocks(blk_f, 2, remat=False)
  params = stack_ref.init(jax.random.PRNGKey(11))
  rng = jax.random.PRNGKey(12)

  def loss(p, stack):
    y, lp = stack.forward(p, x, jnp.zeros((x.shape[0],)), rng=rng,
                          train=True)
    return jnp.mean(lp) + 0.05 * jnp.sum(y ** 2)

  v_ref, g_ref = jax.value_and_grad(loss)(params, stack_ref)
  v_f, g_f = jax.value_and_grad(loss)(params, stack_f)
  np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-4)
  for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                  jax.tree_util.tree_leaves(g_f)):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4,
                               atol=3e-4)
