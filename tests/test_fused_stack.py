"""Stacked fused iResBlock kernels (one Pallas call per scale) vs the
per-block path.

Oracles, strongest first:
  1. the scanned per-block `fused_block_apply` path through
     `ScannedIResBlocks.forward` (round-3 golden-tested semantics) —
     values AND gradients must match, since the stacked kernels claim
     identical math on the same hoisted randomness;
  2. `fused_stack_reference` (pure-jnp per-block loop of
     `fused_block_reference`);
  3. the kernels themselves in interpret mode (the driver benches the
     compiled versions on the real chip).

The kernel-level checks exercise the aliased HBM activation/cotangent
carry (x<->y, ybar<->xbar) and the per-row weight-gradient accumulators —
the two structural differences from the single-block kernels.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows.resflow import (IResBlock, LipschitzNNet,
                                    ScannedIResBlocks,
                                    _poisson_rcdf_table)
from indm_tpu.ops import fused_stack as fs

# fused_chain_ok requires idim >= 33 and in_ch < 33; B/HW chosen so
# _pick_batch_tile gives >= 2 batch tiles (the aliased carry requirement)
_IN, _IDIM, _HW, _B, _NB = 3, 64, 8, 32, 3


def _setup(cond=True, seed=0):
  rng = np.random.default_rng(seed)
  shp = dict(
      w0s=(_NB, 3, 3, _IN, _IDIM),
      w1s=(_NB, 1, 1, _IDIM, _IDIM),
      w2s=(_NB, 3, 3, _IDIM, _IN),
      b0s=(_NB, _IDIM), b1s=(_NB, _IDIM), b2s=(_NB, _IN))
  ws = {k: jnp.asarray(rng.normal(0, 0.15, v).astype(np.float32))
        for k, v in shp.items()}
  x = jnp.asarray(rng.normal(0, 1, (_B, _HW, _HW, _IN)).astype(np.float32))
  eps = jnp.asarray(rng.normal(
      0, 1, (_NB, _B, _HW, _HW, _IN)).astype(np.float32))
  hps = (jnp.asarray(rng.normal(0, 0.3, (_NB, _B, _IDIM))
                     .astype(np.float32)) if cond else None)
  n_all = jnp.asarray(rng.integers(0, 4, (_NB,)), jnp.int32)
  return ws, x, eps, hps, n_all


def _assert_close_scaled(a, b, name, tol=5e-5):
  """Scale-aware gradient comparison: single f32 elements of a sum whose
  other entries reach |max(b)| carry accumulation-order noise of order
  eps * max|b| — a fixed atol/rtol pair misflags small entries (the
  in-kernel polynomial sincos adds ~2e-6/eval on top)."""
  a, b = np.asarray(a), np.asarray(b)
  scale = np.abs(b).max() + 1.0
  err = np.abs(a - b).max()
  assert err <= tol * scale, (
      f"gradient mismatch for {name}: max|diff|={err:.3e} vs scale "
      f"{scale:.3e} (allowed {tol * scale:.3e})")


@pytest.mark.parametrize("cond", [True, False])
def test_stack_fwd_matches_reference(cond):
  ws, x, eps, hps, n_all = _setup(cond=cond)
  offset = 2
  table = jnp.asarray(_poisson_rcdf_table(2.0, offset))
  cfg = (offset, True, "float32", True)      # interpret mode, f32

  y, ld = fs.fused_stack_apply(cfg, x, ws["w0s"], ws["w1s"], ws["w2s"],
                               ws["b0s"], ws["b1s"], ws["b2s"], hps,
                               eps, n_all, table)
  y_ref, ld_ref = fs.fused_stack_reference(
      x, (ws["w0s"], ws["w1s"], ws["w2s"]),
      (ws["b0s"], ws["b1s"], ws["b2s"]), hps, eps, n_all, table, offset,
      True)
  # the in-kernel polynomial sincos (max err 2.3e-6/eval) accumulates
  # over the stacked blocks: y stays ~1e-5, the logdet sum ~1e-4 relative
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                             rtol=1e-4, atol=2e-5)
  np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref),
                             rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("cond", [True, False])
def test_stack_gradients_match_autodiff(cond):
  """grad of (a.y_loss + b.logdet_loss) wrt x, stacked weights, biases,
  hp must match jax.grad through the pure-jnp reference loop (which gets
  the second-order logdet backward from autodiff)."""
  ws, x, eps, hps, n_all = _setup(cond=cond, seed=3)
  offset = 2
  table = jnp.asarray(_poisson_rcdf_table(2.0, offset))
  cfg = (offset, True, "float32", True)
  wy = jax.random.normal(jax.random.PRNGKey(9), x.shape)
  wl = jax.random.normal(jax.random.PRNGKey(10), (x.shape[0],))

  def loss_kernel(x_, w0, w1, w2, b0, b1, b2, hp):
    y, ld = fs.fused_stack_apply(cfg, x_, w0, w1, w2, b0, b1, b2, hp,
                                 eps, n_all, table)
    return jnp.sum(y * wy) + jnp.sum(ld * wl)

  def loss_ref(x_, w0, w1, w2, b0, b1, b2, hp):
    y, ld = fs.fused_stack_reference(x_, (w0, w1, w2), (b0, b1, b2), hp,
                                     eps, n_all, table, offset, True)
    return jnp.sum(y * wy) + jnp.sum(ld * wl)

  args = (x, ws["w0s"], ws["w1s"], ws["w2s"], ws["b0s"], ws["b1s"],
          ws["b2s"])
  argnums = tuple(range(7)) + ((7,) if cond else ())
  g_k = jax.grad(loss_kernel, argnums)(*args, hps)
  g_r = jax.grad(loss_ref, argnums)(*args, hps)
  names = ["x", "w0", "w1", "w2", "b0", "b1", "b2"] + (
      ["hp"] if cond else [])
  for name, a, b in zip(names, g_k, g_r):
    _assert_close_scaled(a, b, name)


def _make_stack(cond):
  nnet = LipschitzNNet(_IN, _IDIM, kernels=(3, 1, 3), coeff=0.98,
                       act="sin", cond_dim=16 if cond else None,
                       preact=True)
  block = IResBlock(nnet, n_dist="poisson", n_exact_terms=2,
                    fused_block=True)
  return ScannedIResBlocks(block, _NB, remat=False)


@pytest.mark.parametrize("cond", [True, False])
def test_scanned_stack_branch_matches_per_block_scan(cond, monkeypatch):
  """ScannedIResBlocks.forward: the fused-stack branch must reproduce the
  per-block fused scan exactly (same hoisted randomness, same math) —
  values and gradients."""
  stack = _make_stack(cond)
  params = stack.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (_B, _HW, _HW, _IN))
  h = (jax.random.normal(jax.random.PRNGKey(2), (_B, 16)) * 0.3
       if cond else None)
  lp0 = jnp.zeros((_B,), jnp.float32)
  rng = jax.random.PRNGKey(3)
  wy = jax.random.normal(jax.random.PRNGKey(9), x.shape)

  def run(p, x_, h_):
    y, lp = stack.forward(p, x_, logpx=lp0, h=h_, rng=rng, train=True)
    return y, lp

  def loss(p, x_, h_):
    y, lp = run(p, x_, h_)
    return jnp.sum(y * wy) + jnp.sum(lp)

  monkeypatch.setenv("INDM_FUSED_STACK", "0")
  y_scan, lp_scan = run(params, x, h)
  argnums = (0, 1) + ((2,) if cond else ())
  g_scan = jax.grad(loss, argnums)(params, x, h)

  monkeypatch.setenv("INDM_FUSED_STACK", "1")
  y_stk, lp_stk = run(params, x, h)
  g_stk = jax.grad(loss, argnums)(params, x, h)

  np.testing.assert_allclose(np.asarray(y_stk), np.asarray(y_scan),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(lp_stk), np.asarray(lp_scan),
                             rtol=1e-4, atol=1e-4)
  flat_s, _ = jax.tree_util.tree_flatten(g_scan)
  flat_k, _ = jax.tree_util.tree_flatten(g_stk)
  assert len(flat_s) == len(flat_k)
  for idx, (a, b) in enumerate(zip(flat_k, flat_s)):
    _assert_close_scaled(a, b, f"leaf {idx}")


def test_stack_single_tile_batch(monkeypatch):
  """B=4 at HW=8 gives ONE full-batch tile (grid (1, nb)): the
  carry-in-output-window still works — values must match the scan."""
  stack = _make_stack(False)
  params = stack.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (4, _HW, _HW, _IN))
  lp0 = jnp.zeros((4,), jnp.float32)

  def run():
    return stack.forward(params, x, logpx=lp0, h=None,
                         rng=jax.random.PRNGKey(3), train=True)

  monkeypatch.setenv("INDM_FUSED_STACK", "0")
  y_scan, lp_scan = run()
  monkeypatch.setenv("INDM_FUSED_STACK", "1")
  y_stk, lp_stk = run()
  np.testing.assert_allclose(np.asarray(y_stk), np.asarray(y_scan),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(lp_stk), np.asarray(lp_scan),
                             rtol=1e-4, atol=1e-4)
