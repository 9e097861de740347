"""Golden-value regression of one train step (SURVEY.md §4(i)).

Fixed seeds + fixed batch -> recorded loss decompositions. Catches silent
numerical regressions in the joint/score steps across refactors. Values
recorded on the 8-device CPU mesh (the test platform); tolerances absorb
XLA version drift, not semantic changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import joint as joint_lib
from indm_tpu import losses as losses_lib
from indm_tpu import sde as sde_lib
from indm_tpu import state as state_lib
from indm_tpu.configs import get_config
from indm_tpu.flows.flow_model import create_flow_model
from indm_tpu.models import create_model


def tiny(nll=True, flow="wolf"):
  cfg = get_config("vp/CIFAR10/indm_nll" if nll else "vp/CIFAR10/indm_fid")
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.flow.model = flow
  cfg.flow.nblocks = "2"
  cfg.flow.intermediate_dim = 8
  cfg.training.batch_size = 4
  return cfg


def _batch():
  return jnp.asarray(np.random.default_rng(42).uniform(
      -1, 1, (4, 8, 8, 3)).astype(np.float32))


GOLDEN = {
    # (losses, losses_score, losses_flow, losses_logp) means
    # (re-recorded after the round-5 ResNet stride-2 padding fix in the
    # wolf encoder — torch conv3x3 pads 1/1 at any stride, flax SAME was
    # padding 0/1; the flow/KL terms shifted accordingly)
    "nll": (13.507109, 11.801678, 0.262468, 1.442963),
    "fid": (13.507109, 0.499847, 0.262468, 1.442963),
    # num_micro_batch=2: grads are SUMMED over two half-batch mean-grads
    # (`losses.py:246-251` accumulation semantics), rng keys split per micro
    "nll_micro2": (13.759600, 12.025796, 0.294769, 1.439034),
    "fid_micro2": (13.759600, 0.524903, 0.294769, 1.439034),
    "score": 11.432556,
}

# L2 norms of the UPDATED parameter pytrees — catches optimizer/EMA/update
# regressions the loss means can't see (round-1 verdict weak #3).
GOLDEN_PNORM = {
    "nll": (23.548054, 87.026047),
    "fid": (23.548098, 87.026047),
    "nll_micro2": (23.548088, 87.025703),
    "fid_micro2": (23.548126, 87.025703),
}


def _pnorm(tree):
  return float(jnp.sqrt(sum(jnp.sum(jnp.square(x))
                            for x in jax.tree_util.tree_leaves(tree))))


@pytest.mark.parametrize("variant",
                         ["nll", "fid", "nll_micro2", "fid_micro2"])
def test_joint_step_golden(variant):
  cfg = tiny(nll=variant.startswith("nll"))
  if variant.endswith("micro2"):
    cfg.optim.num_micro_batch = 2
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  sde = sde_lib.get_sde(cfg)
  fm = create_flow_model(cfg)
  fp, fb = fm.init(jax.random.PRNGKey(1))
  so = state_lib.make_optimizer(cfg)
  fo = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
  ss = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"}, so,
      jax.random.PRNGKey(2))
  fs = state_lib.init_train_state(cfg, fp, fb, fo, jax.random.PRNGKey(3))
  step = joint_lib.make_joint_step_fn(cfg, sde, module, fm, so, fo,
                                      train=True)
  (ss2, fs2), metrics = jax.jit(step)((ss, fs), _batch())
  assert all(np.asarray(m).shape == (4,) for m in metrics)
  vals = [float(np.asarray(m).mean()) for m in metrics]
  np.testing.assert_allclose(vals, GOLDEN[variant], rtol=2e-3, atol=1e-4)
  np.testing.assert_allclose([_pnorm(ss2.params), _pnorm(fs2.params)],
                             GOLDEN_PNORM[variant], rtol=5e-4)
  # the step actually moved both parameter sets
  assert int(ss2.step) == 1 and int(fs2.step) == 1


def test_score_step_golden():
  cfg = tiny()
  cfg.flow.model = "identity"
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  sde = sde_lib.get_sde(cfg)
  so = state_lib.make_optimizer(cfg)
  ss = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"}, so,
      jax.random.PRNGKey(2))
  step = losses_lib.make_score_step_fn(cfg, sde, module, so, train=True)
  ss2, metrics = jax.jit(step)(ss, _batch())
  np.testing.assert_allclose(float(np.asarray(metrics).mean()),
                             GOLDEN["score"], rtol=2e-3)
