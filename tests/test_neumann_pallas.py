"""Fused Pallas Neumann-chain kernel vs the jax.vjp chain it replaces.

Three layers of oracles, strongest first:
  1. repeated `jax.vjp` through the actual LipschitzNNet (the exact XLA
     while_loop semantics of `IResBlock._logdetgrad`);
  2. `neumann_chain_ref` (pure-jnp transcription of the kernel math);
  3. `neumann_chain_pallas(interpret=True)` (the kernel itself, interpreted
     on CPU — the driver benches the compiled version on the real chip).
Plus an end-to-end check that IResBlock(chain_pallas=True) reproduces the
default path's logdet for the same rng.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows.resflow import (IResBlock, LipschitzNNet,
                                    _poisson_rcdf_table)
from indm_tpu.ops import neumann_pallas


def _setup(preact=True, cond=True, seed=0, in_ch=12, idim=32, hw=8, b=4):
  nnet = LipschitzNNet(in_ch, idim, kernels=(3, 1, 3), coeff=0.98,
                       act="sin", cond_dim=16 if cond else None,
                       preact=preact)
  params = nnet.init(jax.random.PRNGKey(seed))
  x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, hw, hw, in_ch))
  h = (jax.random.normal(jax.random.PRNGKey(seed + 2), (b, 16))
       if cond else None)
  eps = jax.random.normal(jax.random.PRNGKey(seed + 3), x.shape)
  return nnet, params, x, h, eps


def _vjp_chain_acc(nnet, params, x, h, eps, n, offset, table):
  """The exact semantics of the XLA while_loop path: repeated jax.vjp."""
  _, vjp = jax.vjp(lambda xx: nnet.apply(params, xx, h=h), x)
  v = eps
  acc = jnp.zeros_like(eps)
  for k in range(1, int(n) + offset + 1):
    (v,) = vjp(v)
    sign = -1.0 if k % 2 == 1 else 1.0
    coeff = float(int(n) >= k - offset) / float(table[k])
    acc = acc + sign * coeff * v
  return acc


@pytest.mark.parametrize("preact,cond", [(True, True), (True, False),
                                         (False, True)])
@pytest.mark.parametrize("n", [0, 2, 5])
def test_chain_ref_matches_vjp(preact, cond, n):
  nnet, params, x, h, eps = _setup(preact=preact, cond=cond)
  offset = 2
  table = _poisson_rcdf_table(2.0, offset)

  acc_vjp = _vjp_chain_acc(nnet, params, x, h, eps, n, offset, table)

  mats = nnet.chain_mats(params, x, h=h)
  assert mats is not None
  weights_t, dacts = mats
  assert len(dacts) == len(weights_t) - (0 if preact else 1)
  acc_ref = neumann_pallas.neumann_chain_ref(
      eps, dacts, weights_t, jnp.asarray(n, jnp.int32), offset,
      jnp.asarray(table))
  np.testing.assert_allclose(np.asarray(acc_ref), np.asarray(acc_vjp),
                             rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [0, 3])
def test_chain_pallas_interpret_matches_vjp(n):
  nnet, params, x, h, eps = _setup()
  offset = 2
  table = _poisson_rcdf_table(2.0, offset)

  acc_vjp = _vjp_chain_acc(nnet, params, x, h, eps, n, offset, table)

  weights_t, dacts = nnet.chain_mats(params, x, h=h)
  acc_pl = neumann_pallas.neumann_chain_pallas(
      eps, dacts, weights_t, jnp.asarray(n, jnp.int32), offset,
      jnp.asarray(table), preact=True, interpret=True)
  np.testing.assert_allclose(np.asarray(acc_pl), np.asarray(acc_vjp),
                             rtol=1e-4, atol=1e-5)


def test_chain_pallas_batch_tiling():
  """grid over batch tiles must agree with one whole-batch call."""
  nnet, params, x, h, eps = _setup(b=8)
  table = _poisson_rcdf_table(2.0, 2)
  weights_t, dacts = nnet.chain_mats(params, x, h=h)
  n = jnp.asarray(3, jnp.int32)
  one = neumann_pallas.neumann_chain_pallas(
      eps, dacts, weights_t, n, 2, jnp.asarray(table), batch_tile=8,
      interpret=True)
  tiled = neumann_pallas.neumann_chain_pallas(
      eps, dacts, weights_t, n, 2, jnp.asarray(table), batch_tile=2,
      interpret=True)
  np.testing.assert_allclose(np.asarray(tiled), np.asarray(one), rtol=1e-5,
                             atol=1e-6)


def test_iresblock_chain_pallas_matches_default():
  """Same rng -> same (g, logdet) from the fused kernel and the XLA chain."""
  nnet, params_n, x, h, _ = _setup()
  blk_ref = IResBlock(nnet, n_dist="poisson")
  blk_pl = IResBlock(nnet, n_dist="poisson", chain_pallas=True)
  params = {"nnet": params_n}
  rng = jax.random.PRNGKey(42)
  logpx = jnp.zeros((x.shape[0],))

  y_ref, lp_ref = blk_ref.forward(params, x, logpx, h=h, rng=rng,
                                  train=True)
  y_pl, lp_pl = blk_pl.forward(params, x, logpx, h=h, rng=rng, train=True)
  np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5,
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(lp_pl), np.asarray(lp_ref),
                             rtol=1e-4, atol=1e-4)


def test_iresblock_chain_pallas_gradients_match():
  """The chain is stop-gradient; parameter grads of the logdet must match
  the default path."""
  nnet, params_n, x, h, _ = _setup()
  params = {"nnet": params_n}
  rng = jax.random.PRNGKey(7)

  def loss(p, block):
    _, lp = block.forward(p, x, jnp.zeros((x.shape[0],)), h=h, rng=rng,
                          train=True)
    return jnp.mean(lp)

  g_ref = jax.grad(loss)(params, IResBlock(nnet, n_dist="poisson"))
  g_pl = jax.grad(loss)(params,
                        IResBlock(nnet, n_dist="poisson", chain_pallas=True))
  for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                  jax.tree_util.tree_leaves(g_pl)):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-5)


def test_iresblock_pallas_honors_unroll_terms():
  """flow.logdet_unroll must take effect under flow.logdet_pallas too: the
  kernel clips the sampled term count to the unroll length instead of
  silently ignoring the truncation."""
  nnet, params_n, x, h, _ = _setup()
  params = {"nnet": params_n}
  rng = jax.random.PRNGKey(11)
  lp0 = jnp.zeros((x.shape[0],))
  for seed in (11, 13):
    rng = jax.random.PRNGKey(seed)
    blk_unroll = IResBlock(nnet, n_dist="poisson", unroll_terms=3)
    blk_both = IResBlock(nnet, n_dist="poisson", unroll_terms=3,
                         chain_pallas=True)
    _, lp_a = blk_unroll.forward(params, x, lp0, h=h, rng=rng, train=True)
    _, lp_b = blk_both.forward(params, x, lp0, h=h, rng=rng, train=True)
    np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_a),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernel_matches_vjp_chain():
  """The fully-fused forward+chain kernel (derivatives computed in-kernel)
  must match the repeated-jax.vjp chain."""
  nnet, params, x, h, eps = _setup(idim=64)
  assert nnet.fused_chain_ok()
  offset = 2
  table = _poisson_rcdf_table(2.0, offset)
  for n in (0, 3):
    acc_vjp = _vjp_chain_acc(nnet, params, x, h, eps, n, offset, table)
    fwd_mats, biases, chain_mats_t, hp = neumann_pallas.fused_chain_inputs(
        nnet.convs, params, h, None)
    acc = neumann_pallas.fused_neumann_chain_pallas(
        x, eps, fwd_mats, biases, chain_mats_t, hp,
        jnp.asarray(n, jnp.int32), offset, jnp.asarray(table),
        preact=True, interpret=True)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_vjp),
                               rtol=1e-4, atol=1e-5)


def test_fused_kernel_no_preact_no_cond():
  nnet, params, x, h, eps = _setup(preact=False, cond=False, idim=64)
  offset = 2
  table = _poisson_rcdf_table(2.0, offset)
  acc_vjp = _vjp_chain_acc(nnet, params, x, None, eps, 2, offset, table)
  fwd_mats, biases, chain_mats_t, hp = neumann_pallas.fused_chain_inputs(
      nnet.convs, params, None, None)
  assert hp is None
  acc = neumann_pallas.fused_neumann_chain_pallas(
      x, eps, fwd_mats, biases, chain_mats_t, hp,
      jnp.asarray(2, jnp.int32), offset, jnp.asarray(table),
      preact=False, interpret=True)
  np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_vjp),
                             rtol=1e-4, atol=1e-5)
