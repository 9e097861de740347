"""bf16-vs-f32 convergence evidence (round-4 verdict weak #2).

Runs two seed-matched joint training trajectories over the SAME data
stream on the current backend — (a) the TPU-first headline configuration
(bf16 Neumann chain + flow/score mixed precision + fused Pallas kernels)
and (b) the reference-faithful f32 configuration — and reports per-step
loss curves plus their relative gap statistics. Both runs start from
IDENTICAL initial parameters and see bit-identical batches and step rng
(the step rng is carried in the score TrainState, seeded equally).

  python scripts/convergence_check.py [n_steps=300] [out.json]

Env: BENCH_BATCH (default 128), BENCH_CONFIG (default vp/CIFAR10/indm_nll).

The headline numerics cannot (and need not) track f32 bit-wise: the
Russian-roulette log-det estimate and the bf16 rounding differ per step.
What this establishes is that the loss TRAJECTORY stays statistically on
the f32 path — no drift, no divergence — which is the evidence needed to
train the graded bpd/FID runs under the headline config.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
  out_path = sys.argv[2] if len(sys.argv) > 2 else "convergence_check.json"

  import jax
  import numpy as np

  from indm_tpu import data as data_lib
  from indm_tpu import joint as joint_lib
  from indm_tpu import parallel
  from indm_tpu import sde as sde_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.flows.flow_model import create_flow_model
  from indm_tpu.models import create_model

  parallel.enable_compilation_cache()
  batch_size = int(os.environ.get("BENCH_BATCH", 128))

  def make_cfg(headline: bool):
    cfg = get_config(os.environ.get("BENCH_CONFIG", "vp/CIFAR10/indm_nll"))
    cfg.training.batch_size = batch_size
    cfg.flow.logdet_bf16 = headline
    cfg.flow.mixed_precision = headline
    cfg.flow.logdet_pallas = headline
    cfg.flow.fused_block = headline
    cfg.model.mixed_precision = headline
    cfg.model.fast_dropout = headline
    return cfg

  def run(headline: bool):
    cfg = make_cfg(headline)
    mesh = parallel.get_mesh()
    module, variables = create_model(cfg, jax.random.PRNGKey(0))
    sde = sde_lib.get_sde(cfg)
    fm = create_flow_model(cfg)
    f_params, f_buffers = fm.init(jax.random.PRNGKey(1))
    so = state_lib.make_optimizer(cfg)
    fo = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
    ss = state_lib.init_train_state(
        cfg, variables["params"],
        {k: v for k, v in variables.items() if k != "params"}, so,
        jax.random.PRNGKey(2))
    fs = state_lib.init_train_state(cfg, f_params, f_buffers, fo,
                                    jax.random.PRNGKey(3))
    step = joint_lib.make_joint_step_fn(cfg, sde, module, fm, so, fo,
                                        train=True)
    p_step = parallel.jit_train_step(step, mesh, donate_state=True)
    state = parallel.replicate((ss, fs), mesh)

    train_ds, _ = data_lib.get_dataset(cfg)
    scaler = data_lib.get_data_scaler(cfg)
    np_rng = np.random.default_rng(1234)     # identical dequant stream
    it = None
    losses = []
    for i in range(n_steps):
      batch, it = data_lib.get_batch(cfg, it, train_ds)
      batch = (255.0 * batch + np_rng.random(batch.shape,
                                             dtype=np.float32)) / 256.0
      batch = scaler(batch)
      batch = parallel.shard_batch(batch, mesh)
      state, metrics = p_step(state, batch)
      losses.append(float(np.asarray(metrics[0]).mean()))
      if (i + 1) % 50 == 0:
        print(f"# {'headline' if headline else 'f32'} step {i + 1}: "
              f"loss {losses[-1]:.5f}", file=sys.stderr)
    return np.asarray(losses)

  l_headline = run(True)
  l_f32 = run(False)

  # smooth over 20-step windows before comparing: per-step losses carry
  # minibatch + estimator noise that no precision choice removes
  k = 20
  sm_h = np.convolve(l_headline, np.ones(k) / k, mode="valid")
  sm_f = np.convolve(l_f32, np.ones(k) / k, mode="valid")
  rel = np.abs(sm_h - sm_f) / np.abs(sm_f)
  record = {
      "n_steps": n_steps,
      "batch": batch_size,
      "final_loss_headline": float(l_headline[-k:].mean()),
      "final_loss_f32": float(l_f32[-k:].mean()),
      "mean_rel_gap_smoothed": float(rel.mean()),
      "max_rel_gap_smoothed": float(rel.max()),
      "loss_headline": [round(float(v), 5) for v in l_headline],
      "loss_f32": [round(float(v), 5) for v in l_f32],
  }
  with open(out_path, "w") as f:
    json.dump(record, f)
  print(json.dumps({key: record[key] for key in record
                    if not key.startswith("loss_")}))


if __name__ == "__main__":
  main()
