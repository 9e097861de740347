"""Every shipped experiment config constructs and takes ONE joint train
step (tiny geometry).

The reference ships 6 experiment files (`/root/reference/configs/{ve,vp}/
{CIFAR10,CELEBA}/indm*.py`); this guards that each one's structural
choices (SDE family, FIR resampling, scale_by_sigma, nll-vs-fid step
variant, soft truncation flags) compose into a runnable joint step — the
config-level analogue of the 22-wolf-preset construction test (the
round-2 lesson: a test that only RESOLVES configs cannot catch a broken
construction path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import joint as joint_lib
from indm_tpu import sde as sde_lib
from indm_tpu import state as state_lib
from indm_tpu.configs import get_config
from indm_tpu.flows.flow_model import create_flow_model
from indm_tpu.models import create_model

_slow = pytest.mark.slow

# one representative config (ve/CELEBA — covers the VE+FIR score branches
# AND the 64x64 wolf flow JSON in one go) stays in the fast subset; the
# other five joint-step compiles (~70-95 s each on CPU) are `slow`
ALL_EXPERIMENTS = [
    pytest.param("vp/CIFAR10/indm_nll", marks=_slow),
    pytest.param("vp/CIFAR10/indm_fid", marks=_slow),
    pytest.param("vp/CELEBA/indm_nll", marks=_slow),
    pytest.param("vp/CELEBA/indm_fid", marks=_slow),
    pytest.param("ve/CIFAR10/indm", marks=_slow),
    "ve/CELEBA/indm",
]

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


def _shrink(cfg):
  """Tiny geometry; every STRUCTURAL switch (sde, fir, progressive,
  scale_by_sigma, step variant, st/importance flags) keeps the config's
  own value."""
  cfg.data.image_size = 8
  cfg.model.nf = 8
  cfg.model.num_res_blocks = 1
  cfg.model.ch_mult = (1, 1)
  cfg.model.attn_resolutions = (4,)
  cfg.training.batch_size = 4
  cfg.flow.nblocks = "1-1"
  cfg.flow.intermediate_dim = 8
  cfg.flow.model_config = "tiny"
  # keep compile time sane on CPU: fixed-unroll estimator
  cfg.flow.logdet_unroll = 4
  return cfg


@pytest.mark.parametrize("name", ALL_EXPERIMENTS)
def test_experiment_config_one_joint_step(name):
  cfg = _shrink(get_config(name))
  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  sde = sde_lib.get_sde(cfg)
  flow_model = create_flow_model(cfg)
  f_params, f_buffers = flow_model.init(jax.random.PRNGKey(1))

  score_opt = state_lib.make_optimizer(cfg)
  flow_opt = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
  s_params = variables["params"]
  s_buffers = {k: v for k, v in variables.items() if k != "params"}
  score_state = state_lib.init_train_state(cfg, s_params, s_buffers,
                                           score_opt, jax.random.PRNGKey(2))
  flow_state = state_lib.init_train_state(cfg, f_params, f_buffers,
                                          flow_opt, jax.random.PRNGKey(3))
  step = joint_lib.make_joint_step_fn(cfg, sde, module, flow_model,
                                      score_opt, flow_opt, train=True)

  batch = jnp.asarray(
      np.random.default_rng(0).uniform(
          -1.0, 1.0, (cfg.training.batch_size, cfg.data.image_size,
                      cfg.data.image_size, cfg.data.num_channels)
      ).astype(np.float32))
  (score_state2, flow_state2), metrics = jax.jit(step)(
      (score_state, flow_state), batch)

  losses = np.asarray(metrics[0])
  assert losses.shape == (cfg.training.batch_size,)
  assert np.all(np.isfinite(losses)), f"{name}: non-finite joint loss"
  # both parameter sets moved
  def moved(a, b):
    return jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x[0] - x[1]))),
        jax.tree_util.tree_map(lambda p, q: (p, q), a, b), 0.0)
  assert moved(score_state.params, score_state2.params) > 0.0
  assert moved(flow_state.params, flow_state2.params) > 0.0
