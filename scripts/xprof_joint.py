"""xprof the FULL joint train step at bench geometry and print top ops.

  python scripts/xprof_joint.py [topk]
Env: BENCH_* as in bench.py (fused_block defaults on here).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xprof_top import parse_xplane  # noqa: E402


def main():
  topk = int(sys.argv[1]) if len(sys.argv) > 1 else 40

  import jax
  import numpy as np

  from indm_tpu import joint as joint_lib
  from indm_tpu import parallel
  from indm_tpu import sde as sde_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.flows.flow_model import create_flow_model
  from indm_tpu.models import create_model

  parallel.enable_compilation_cache()
  batch_size = int(os.environ.get("BENCH_BATCH", 128))
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.training.batch_size = batch_size
  cfg.flow.logdet_unroll = int(os.environ.get("BENCH_LOGDET_UNROLL", 0))
  cfg.flow.logdet_bf16 = bool(int(os.environ.get("BENCH_LOGDET_BF16", "1")))
  cfg.flow.mixed_precision = bool(int(os.environ.get("BENCH_FLOW_MP", "1")))
  cfg.flow.logdet_pallas = bool(int(os.environ.get("BENCH_LOGDET_PALLAS",
                                                   "1")))
  cfg.flow.fused_block = bool(int(os.environ.get("BENCH_FUSED_BLOCK", "1")))
  cfg.model.mixed_precision = bool(int(os.environ.get("BENCH_SCORE_MP",
                                                      "1")))
  cfg.model.fast_dropout = bool(int(os.environ.get("BENCH_FAST_DROPOUT",
                                                   "1")))

  if os.environ.get("BENCH_FLOW"):
    cfg.flow.model = os.environ["BENCH_FLOW"]

  rng = jax.random.PRNGKey(0)
  module, variables = create_model(cfg, rng)
  sde = sde_lib.get_sde(cfg)
  flow_model = create_flow_model(cfg)
  score_opt = state_lib.make_optimizer(cfg)
  score_state = state_lib.init_train_state(
      cfg, variables["params"],
      {k: v for k, v in variables.items() if k != "params"},
      score_opt, jax.random.PRNGKey(2))
  mesh = parallel.get_mesh()
  if flow_model is None:
    from indm_tpu import losses as losses_lib
    step = losses_lib.make_score_step_fn(cfg, sde, module, score_opt,
                                         train=True)
    state = parallel.replicate(score_state, mesh)
  else:
    flow_opt = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
    f_params, f_buffers = flow_model.init(jax.random.PRNGKey(1))
    flow_state = state_lib.init_train_state(cfg, f_params, f_buffers,
                                            flow_opt, jax.random.PRNGKey(3))
    step = joint_lib.make_joint_step_fn(cfg, sde, module, flow_model,
                                        score_opt, flow_opt, train=True)
    state = parallel.replicate((score_state, flow_state), mesh)
  batch = np.random.default_rng(0).uniform(
      -1, 1, (batch_size, 32, 32, 3)).astype(np.float32)
  batch = parallel.shard_batch(batch, mesh)
  p_step = parallel.jit_train_step(step, mesh, donate_state=True)

  state, metrics = p_step(state, batch)
  float(np.asarray(metrics[0] if isinstance(metrics, (tuple, list))
                   else metrics).mean())

  trace_dir = os.environ.get("XPROF_DIR", "/tmp/xprof_joint")
  os.system(f"rm -rf {trace_dir}")
  jax.profiler.start_trace(trace_dir)
  for _ in range(2):
    state, metrics = p_step(state, batch)
  float(np.asarray(metrics[0] if isinstance(metrics, (tuple, list))
                   else metrics).mean())
  jax.profiler.stop_trace()

  planes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
  print("trace files:", planes)
  for p in planes:
    parse_xplane(p, topk)


if __name__ == "__main__":
  main()
