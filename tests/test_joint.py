"""Joint flow+score training (INDM core): one train step + NELBO on CPU —
the driver's config #1 (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import joint as joint_lib
from indm_tpu import likelihood as likelihood_lib
from indm_tpu import sde as sde_lib
from indm_tpu import state as state_lib
from indm_tpu.configs import get_config
from indm_tpu.flows.flow_model import create_flow_model, flow_forward
from indm_tpu.models import create_model, get_score_fn


def tiny_cfg(nll=True):
  cfg = get_config("vp/CIFAR10/indm_nll" if nll else "vp/CIFAR10/indm_fid")
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.training.batch_size = 4
  cfg.flow.nblocks = "1-1"
  cfg.flow.intermediate_dim = 8
  # tiny wolf encoder: 8x8 -> 3 levels of stride-2 -> 1x1 * out_planes
  cfg.flow.model_config = "tiny"
  return cfg


TINY_WOLF = {
    "generator": {"flow": {"type": "resflow"}},
    "discriminator": {
        "type": "gaussian",
        "encoder": {"type": "global_resnet_bn", "levels": 3,
                    "in_planes": 3, "hidden_planes": [4, 8, 8],
                    "out_planes": 8, "activation": "elu"},
        "in_dim": 8, "dim": 64,
        "prior": {"type": "flow", "num_steps": 1, "in_features": 64,
                  "hidden_features": 16, "activation": "elu",
                  "transform": "affine", "alpha": 1.0,
                  "coupling_type": "mlp"},
    },
    "dequantizer": {"type": "uniform"},
}


@pytest.fixture(autouse=True)
def _register_tiny_preset():
  from indm_tpu.configs import wolf_presets
  wolf_presets.PRESETS["tiny"] = TINY_WOLF
  yield
  wolf_presets.PRESETS.pop("tiny", None)


def build(nll=True):
  cfg = tiny_cfg(nll)
  rng = jax.random.PRNGKey(0)
  module, variables = create_model(cfg, rng)
  sde = sde_lib.get_sde(cfg)
  flow_model = create_flow_model(cfg)
  f_params, f_buffers = flow_model.init(jax.random.PRNGKey(1))

  score_opt = state_lib.make_optimizer(cfg)
  flow_opt = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
  s_params = variables["params"]
  s_buffers = {k: v for k, v in variables.items() if k != "params"}
  score_state = state_lib.init_train_state(cfg, s_params, s_buffers,
                                           score_opt, jax.random.PRNGKey(2))
  flow_state = state_lib.init_train_state(cfg, f_params, f_buffers, flow_opt,
                                          jax.random.PRNGKey(3))
  step = joint_lib.make_joint_step_fn(cfg, sde, module, flow_model,
                                      score_opt, flow_opt, train=True)
  return cfg, sde, module, flow_model, score_state, flow_state, step


def _param_delta(a, b):
  return jax.tree_util.tree_reduce(
      lambda acc, x: acc + float(jnp.abs(x).sum()),
      jax.tree_util.tree_map(lambda p, q: p - q, a, b), 0.0)


def test_joint_nll_step():
  cfg, sde, module, flow_model, ss, fs, step = build(nll=True)
  batch = jax.random.uniform(jax.random.PRNGKey(4), (4, 8, 8, 3)) * 2 - 1
  step = jax.jit(step)
  (ss2, fs2), (losses, l_score, l_flow, l_logp) = step((ss, fs), batch)
  for l in (losses, l_score, l_flow, l_logp):
    assert l.shape == (4,)
    assert np.isfinite(np.asarray(l)).all()
  np.testing.assert_allclose(np.asarray(losses),
                             np.asarray(l_score + l_flow + l_logp),
                             rtol=1e-5)
  assert _param_delta(ss.params, ss2.params) > 0
  assert _param_delta(fs.params, fs2.params) > 0
  # BatchNorm running stats were updated functionally
  assert _param_delta(fs.buffers, fs2.buffers) > 0


def test_joint_fid_step():
  cfg, sde, module, flow_model, ss, fs, step = build(nll=False)
  batch = jax.random.uniform(jax.random.PRNGKey(5), (4, 8, 8, 3)) * 2 - 1
  (ss2, fs2), (losses, l_score, l_flow, l_logp) = jax.jit(step)((ss, fs),
                                                               batch)
  assert np.isfinite(np.asarray(losses)).all()
  assert np.isfinite(np.asarray(l_score)).all()
  assert _param_delta(ss.params, ss2.params) > 0
  assert _param_delta(fs.params, fs2.params) > 0


@pytest.mark.parametrize(
    "nll", [True, pytest.param(False, marks=pytest.mark.slow)],
    ids=["nll", "fid"])
def test_joint_sharded_matches_single_device(nll, devices):
  """The full joint step (two optimizers, Lipschitz converge, wolf encoder
  BatchNorm threading) must produce identical params, buffers, and losses
  on the 8-device mesh and on a single device (SURVEY.md §4(h))."""
  from indm_tpu import parallel

  cfg, sde, module, flow_model, ss, fs, step = build(nll=nll)
  batch = jax.random.uniform(jax.random.PRNGKey(11), (8, 8, 8, 3)) * 2 - 1

  (ss1, fs1), metrics1 = jax.jit(step)((ss, fs), batch)

  mesh = parallel.get_mesh(devices)
  state_r = parallel.replicate((ss, fs), mesh)
  batch_s = parallel.shard_batch(np.asarray(batch), mesh)
  pstep = parallel.jit_train_step(step, mesh, donate_state=False)
  (ss8, fs8), metrics8 = pstep(state_r, batch_s)

  for m1, m8 in zip(metrics1, metrics8):
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), rtol=1e-4,
                               atol=1e-5)
  for tree1, tree8 in ((ss1.params, ss8.params), (fs1.params, fs8.params),
                       (fs1.buffers, fs8.buffers)):
    for a, b in zip(jax.tree_util.tree_leaves(tree1),
                    jax.tree_util.tree_leaves(tree8)):
      # atol absorbs GSPMD reduction-order noise on near-zero leaves (the
      # sharded all-reduce sums in a different order than one device)
      np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                 atol=1e-4)


def test_joint_nelbo_with_flow():
  cfg, sde, module, flow_model, ss, fs, step = build(nll=True)
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  score_fn = get_score_fn(cfg, sde, module,
                          {"params": ss.params, **ss.buffers},
                          train=False, continuous=True)

  def ff(x):
    z, logdet, _ = flow_forward(cfg, flow_model, fs.params, fs.buffers, x,
                                rng=jax.random.PRNGKey(9), train=False)
    return z, logdet

  elbo_fn = likelihood_lib.get_elbo_fn(cfg, sde, inverse_scaler)
  batch = jax.random.uniform(jax.random.PRNGKey(6), (4, 8, 8, 3)) * 2 - 1
  nelbo, nelbo_res = jax.jit(
      lambda r, b: elbo_fn(r, score_fn, ff, b))(jax.random.PRNGKey(7), batch)
  assert nelbo.shape == (4,)
  assert np.isfinite(np.asarray(nelbo)).all()
  assert np.isfinite(np.asarray(nelbo_res)).all()


def test_flow_forward_wolf_loss_semantics():
  """wolf flow_forward returns logdet - KL; the joint loss negates it
  (`wolf.py:116-128`, `losses.py:296-301`)."""
  cfg, sde, module, flow_model, ss, fs, step = build(nll=True)
  x = jax.random.uniform(jax.random.PRNGKey(8), (4, 8, 8, 3)) * 2 - 1
  z, logdet_kl, _ = flow_forward(cfg, flow_model, fs.params, fs.buffers, x,
                                 rng=jax.random.PRNGKey(9), train=False)
  assert z.shape == x.shape
  assert logdet_kl.shape == (4,)
  # reverse pass produces image-shaped output
  xr, _, _ = flow_forward(cfg, flow_model, fs.params, fs.buffers, z,
                          rng=jax.random.PRNGKey(10), reverse=True)
  assert xr.shape == x.shape
  assert np.isfinite(np.asarray(xr)).all()
