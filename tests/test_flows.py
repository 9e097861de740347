"""Residual-flow tests (SURVEY.md §4(d,e)): invertibility, log-det vs
exact-trace oracle, Lipschitz bound of Lop layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu.flows import lipschitz as lip
from indm_tpu.flows import resflow as rf


def small_block(cond_dim=None, seed=0):
  nnet = rf.LipschitzNNet(in_ch=2, idim=8, kernels=(3, 1, 3), coeff=0.98,
                          act="sin", cond_dim=cond_dim, preact=False)
  block = rf.IResBlock(nnet, n_dist="poisson", n_exact_terms=2)
  params = block.init(jax.random.PRNGKey(seed))
  return block, params


def test_lop_conv_row_norm_bounded():
  conv = lip.LopConv2d(3, 5, 3, coeff=0.98)
  params = conv.init(jax.random.PRNGKey(0))
  params = {**params, "w": params["w"] * 10.0}  # force violation
  w = conv.normalized_weight(params)
  row_l1 = np.asarray(jnp.sum(jnp.abs(w), axis=(0, 1, 2)))
  assert (row_l1 <= 0.98 + 1e-5).all()
  # rows already under the bound are untouched
  params2 = conv.init(jax.random.PRNGKey(1))
  small = {**params2, "w": params2["w"] * 1e-3}
  np.testing.assert_allclose(np.asarray(conv.normalized_weight(small)),
                             np.asarray(small["w"]))


def test_lop_conv_gradient_flows_through_normalization():
  conv = lip.LopConv2d(2, 2, 3, coeff=0.98)
  params = conv.init(jax.random.PRNGKey(0))
  params = {**params, "w": params["w"] * 5.0}
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2))
  g = jax.grad(lambda p: jnp.sum(conv.apply(p, x) ** 2))(params)
  assert np.isfinite(np.asarray(g["w"])).all()
  assert float(jnp.abs(g["w"]).sum()) > 0


def test_iresblock_inverse_fixed_point():
  block, params = small_block()
  x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 2))
  y, _ = block.forward(params, x, rng=jax.random.PRNGKey(3))
  x_rec = block._inverse_fixed_point(params, y, None)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)


def test_iresblock_logdet_eval_estimator_close_to_exact():
  """Eval mode: n + 20 exact terms (`iresblock.py:117-123`) — the power
  series converges fast for coeff<=0.98, so a single draw is tight."""
  block, params = small_block()
  x = jax.random.normal(jax.random.PRNGKey(4), (3, 4, 4, 2)) * 0.3
  exact = np.asarray(block.exact_logdet(params, x))
  vals = []
  for s in range(6):
    _, ld = block._logdetgrad(params, x, None, jax.random.PRNGKey(10 + s),
                              train=False)
    vals.append(np.asarray(ld))
  est = np.mean(vals, axis=0)
  np.testing.assert_allclose(est, exact, atol=0.06)


def test_iresblock_neumann_estimator_unbiased():
  block, params = small_block()
  x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 2)) * 0.3
  exact = np.asarray(block.exact_logdet(params, x))
  f = jax.jit(lambda r: block._logdetgrad(params, x, None, r, train=True)[1])
  vals = np.stack([np.asarray(f(jax.random.PRNGKey(100 + s)))
                   for s in range(200)])
  est = vals.mean(0)
  sem = vals.std(0) / np.sqrt(len(vals))
  assert (np.abs(est - exact) < 4 * sem + 0.02).all(), (est, exact, sem)


def test_iresblock_neumann_gradient_matches_exact():
  """Gradient path of the Neumann trick vs autodiff through the exact
  log-det (expectation over Hutchinson + n)."""
  block, params = small_block()
  x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 2)) * 0.3

  g_exact = jax.grad(
      lambda p: jnp.sum(block.exact_logdet(p, x)))(params)

  def est_grad(r):
    return jax.grad(
        lambda p: jnp.sum(block._logdetgrad(p, x, None, r, train=True)[1])
    )(params)

  f = jax.jit(est_grad)
  grads = [f(jax.random.PRNGKey(200 + s)) for s in range(120)]
  mean_g = jax.tree_util.tree_map(
      lambda *gs: np.mean(np.stack(gs), 0), *grads)
  w_exact = np.asarray(g_exact["nnet"][0]["w"]).ravel()
  w_est = np.asarray(mean_g["nnet"][0]["w"]).ravel()
  # correlation of gradient directions should be high
  c = np.dot(w_exact, w_est) / (np.linalg.norm(w_exact)
                                * np.linalg.norm(w_est) + 1e-12)
  assert c > 0.95, c


def test_squeeze_roundtrip_and_ordering():
  x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
  y = rf.squeeze_nhwc(x)
  assert y.shape == (2, 2, 2, 12)
  # torch ordering: out channel = c*4 + dy*2 + dx
  np.testing.assert_allclose(np.asarray(y[0, 0, 0, 0]),
                             np.asarray(x[0, 0, 0, 0]))
  np.testing.assert_allclose(np.asarray(y[0, 0, 0, 1]),
                             np.asarray(x[0, 0, 1, 0]))  # dx=1
  np.testing.assert_allclose(np.asarray(y[0, 0, 0, 2]),
                             np.asarray(x[0, 1, 0, 0]))  # dy=1
  np.testing.assert_allclose(np.asarray(y[0, 0, 0, 4]),
                             np.asarray(x[0, 0, 0, 1]))  # c=1
  np.testing.assert_allclose(np.asarray(rf.unsqueeze_nhwc(y)), np.asarray(x))


def test_residual_flow_roundtrip():
  flow = rf.ResidualFlow(image_hw=8, in_ch=2, n_blocks=(2, 2),
                         intermediate_dim=8)
  params = flow.init(jax.random.PRNGKey(7))
  x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 2))
  z, logpx = flow.fwdpass(params, x, rng=jax.random.PRNGKey(9), train=False)
  assert z.shape == x.shape
  assert logpx.shape == (2,)
  x_rec, _ = flow.bwdpass(params, z)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-4)


def test_residual_flow_conditional():
  flow = rf.ResidualFlow(image_hw=8, in_ch=2, n_blocks=(2,),
                         intermediate_dim=8, cond_dim=6)
  params = flow.init(jax.random.PRNGKey(10))
  x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 2))
  h = jax.random.normal(jax.random.PRNGKey(12), (2, 6))
  z, logpx = flow.fwdpass(params, x, h=h, rng=jax.random.PRNGKey(13))
  x_rec, _ = flow.bwdpass(params, z, h=h)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-4)
  # conditioning actually matters
  z2, _ = flow.fwdpass(params, x, h=h * 3.0, rng=jax.random.PRNGKey(13))
  assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_actnorm_and_invertible_conv_logdet():
  an = rf.ActNorm2d(3)
  p = an.init(jax.random.PRNGKey(0))
  p = {**p, "log_scale": jnp.asarray([0.1, -0.2, 0.3])}
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
  y, logpx = an.forward(p, x, jnp.zeros(2))
  x_rec, logpx2 = an.inverse(p, y, logpx)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(logpx2), 0.0, atol=1e-5)

  ic = rf.InvertibleConv2d(3)
  p = ic.init(jax.random.PRNGKey(2))
  y, logpx = ic.forward(p, x, jnp.zeros(2))
  # orthogonal init: |det| = 1 → logdet 0
  np.testing.assert_allclose(np.asarray(logpx), 0.0, atol=1e-4)
  x_rec, _ = ic.inverse(p, y, logpx)
  np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_induced_norm_sigma_matches_svd():
  """InducedNorm(2,2) power iteration must find the top singular value
  (SURVEY.md §4(e))."""
  lin = lip.InducedNormLinear(12, 10, coeff=0.97, domain=2, codomain=2)
  params = lin.init(jax.random.PRNGKey(0))
  w = params["w"]
  sigma_true = float(jnp.linalg.svd(w, compute_uv=False)[0])
  u, v = params["u"], params["v"]
  sigma_est = float(u @ (v @ w))
  assert abs(sigma_est - sigma_true) / sigma_true < 1e-3
  # soft normalization bounds the spectral norm by coeff
  params = {**params, "w": w * 5.0}
  params = lin.converge(params, n_iter=200)
  wn = lin.normalized_weight(params)
  assert float(jnp.linalg.svd(wn, compute_uv=False)[0]) <= 0.97 * 1.01


def test_spectral_norm_conv_converge():
  conv = lip.SpectralNormConv2d(3, 4, 3, input_hw=(6, 6), coeff=0.9)
  params = conv.init(jax.random.PRNGKey(1))
  params = {**params, "w": params["w"] * 3.0}
  params = conv.converge(params, n_iter=100)
  w, _ = conv.normalized_weight(params, update=False)
  # apply to the converged v: ||conv(v)|| <= coeff approximately
  v = params["v"]
  out = conv._conv(w, v)
  assert float(jnp.linalg.norm(out)) <= 0.9 * 1.05


def test_bf16_chain_estimator_close_to_f32():
  """chain_bf16 only perturbs the Hutchinson vector u — same single-draw
  estimate to ~bf16 resolution, and still unbiased vs the exact logdet."""
  nnet = rf.LipschitzNNet(in_ch=2, idim=8, kernels=(3, 1, 3), coeff=0.98,
                          act="sin", preact=False)
  b32 = rf.IResBlock(nnet, n_dist="poisson", n_exact_terms=2,
                     unroll_terms=8)
  b16 = rf.IResBlock(nnet, n_dist="poisson", n_exact_terms=2,
                     unroll_terms=8, chain_bf16=True)
  params = b32.init(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2)) * 0.3
  r = jax.random.PRNGKey(2)
  _, ld32 = b32._logdetgrad(params, x, None, r, train=True)
  _, ld16 = b16._logdetgrad(params, x, None, r, train=True)
  np.testing.assert_allclose(np.asarray(ld16), np.asarray(ld32), atol=0.05,
                             rtol=0.05)
  # gradients still flow (differentiable path is f32)
  g = jax.grad(lambda p: jnp.sum(
      b16._logdetgrad(p, x, None, r, train=True)[1]))(params)
  assert all(np.isfinite(np.asarray(l)).all()
             for l in jax.tree_util.tree_leaves(g))


def test_spectral_norm_linear_sigma_matches_svd():
  sn = lip.SpectralNormLinear(6, 4, coeff=0.9)
  params = sn.init(jax.random.PRNGKey(0))
  params = {**params, "w": params["w"] * 3.0}
  params = sn.converge(params, n_iter=300)
  w_hat, _ = sn.normalized_weight(params)
  sigma = float(jnp.linalg.svd(w_hat, compute_uv=False)[0])
  assert sigma <= 0.9 + 1e-3, sigma


def test_lipnorm_layers_respect_bound():
  ln = lip.LipNormLinear(5, 7, coeff=0.8)
  params = ln.init(jax.random.PRNGKey(0))
  w_hat = ln.normalized_weight(params)
  # w is (in, out): inf->inf operator norm of x @ w = max column 1-norm,
  # hard-normalized to sigmoid(s)*coeff < coeff
  col_norm = float(jnp.max(jnp.sum(jnp.abs(w_hat), axis=0)))
  assert col_norm <= 0.8 + 1e-5
  # when the init scale ratio is inside (0,1), sigmoid(logit(x)) = x and the
  # normalized weight equals the raw weight
  ratio = ln._scale(params["w"]) / 0.8
  if float(jnp.max(ratio)) < 1.0:
    np.testing.assert_allclose(np.asarray(w_hat), np.asarray(params["w"]),
                               rtol=1e-4, atol=1e-6)

  lc = lip.LipNormConv2d(3, 4, 3, coeff=0.8)
  cparams = lc.init(jax.random.PRNGKey(1))
  w_hat = lc.normalized_weight(cparams)
  col_norm = float(jnp.max(jnp.sum(jnp.abs(w_hat), axis=(0, 1, 2))))
  assert col_norm <= 0.8 + 1e-5
  x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 5, 3))
  assert lc.apply(cparams, x).shape == (2, 5, 5, 4)


def test_actnorm1d_and_invertible_linear_roundtrip():
  an = rf.ActNorm1d(4)
  ap = an.init(jax.random.PRNGKey(0))
  ap = {"bias": jnp.ones((4,)) * 0.3, "log_scale": jnp.ones((4,)) * 0.2}
  il = rf.InvertibleLinear(4)
  ip = il.init(jax.random.PRNGKey(1))
  x = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
  lp0 = jnp.zeros((5,))
  y, lp = an.forward(ap, x, lp0)
  y, lp = il.forward(ip, y, lp)
  x2, lp2 = il.inverse(ip, y, lp)
  x2, lp2 = an.inverse(ap, x2, lp2)
  np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
  np.testing.assert_allclose(np.asarray(lp2), 0.0, atol=1e-5)
  # actnorm logdet: -(sum log_scale) per sample, no spatial factor
  _, lp_a = an.forward(ap, x, lp0)
  np.testing.assert_allclose(np.asarray(lp_a), -0.8, atol=1e-5)


@pytest.mark.parametrize("cin,cout", [(64, 3), (3, 64), (2, 128), (128, 2)])
def test_conv3x3_dot_paths_match_xla_conv(cin, cout):
  """The narrow-boundary dot formulations must match the direct conv
  exactly (values and gradients) — they replace it on TPU for layout
  reasons."""
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, cin))
  w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout)) * 0.1

  ref = jax.lax.conv_general_dilated(
      x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
  out = lip.lipschitz_conv_apply(x, w, 3)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

  # gradients through both paths agree
  g_ref = jax.grad(lambda w_: jnp.sum(jax.lax.conv_general_dilated(
      x, w_, (1, 1), "SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(w)
  g_out = jax.grad(
      lambda w_: jnp.sum(lip.lipschitz_conv_apply(x, w_, 3) ** 2))(w)
  np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                             atol=2e-4, rtol=1e-4)
  gx_ref = jax.grad(lambda x_: jnp.sum(jax.lax.conv_general_dilated(
      x_, w, (1, 1), "SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(x)
  gx_out = jax.grad(
      lambda x_: jnp.sum(lip.lipschitz_conv_apply(x_, w, 3) ** 2))(x)
  np.testing.assert_allclose(np.asarray(gx_out), np.asarray(gx_ref),
                             atol=2e-4, rtol=1e-4)
