"""Convert a published reference INDM FLOW checkpoint into indm_tpu's
msgpack format — the flow half of a reference checkpoint pair
(companion to `convert_score_checkpoint.py`).

  python scripts/convert_flow_checkpoint.py <flow_checkpoint.pth> \
      <config-name e.g. vp/CIFAR10/indm_nll> <out.msgpack>

The reference flow checkpoint (`/root/reference/utils.py:114-145`
`load_flow_model` + `utils.py:36-48`) is a torch-pickled dict
{optimizer, model, ema, step}; `model` is a DataParallel state_dict of the
`WolfCore` built from the config's wolf JSON, `ema` holds shadow_params
ordered like `model.parameters()`. The output restores into
`run_lib.load_flow_model` via `checkpoint.restore_checkpoint`
(params + buffers + EMA + step; the optimizer state starts fresh).

After converting BOTH halves, point a workdir at them for evaluation:

  workdir/checkpoints/checkpoint_<N>.msgpack        (score, from
                                                     convert_score_checkpoint)
  workdir/checkpoints/flow_checkpoint_<N>.msgpack   (flow, this script)

and run `python main.py --mode eval --config ... --workdir workdir \
  --config.eval.target_ckpt <N>`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  if len(sys.argv) != 4:
    print(__doc__)
    sys.exit(2)
  in_path, cfg_name, out_path = sys.argv[1:4]

  import torch  # unpickling only; weights land in numpy
  import jax

  from indm_tpu import checkpoint as ckpt_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.configs.wolf_presets import load_wolf_params
  from indm_tpu.flows import convert as fconvert
  from indm_tpu.flows.flow_model import create_flow_model

  cfg = get_config(cfg_name)
  assert cfg.flow.model == "wolf", (
      f"config {cfg_name} has flow.model={cfg.flow.model!r}; the published "
      "INDM checkpoints are wolf flows")
  wolf_params = load_wolf_params(cfg.flow.model_config)
  ckpt = torch.load(in_path, map_location="cpu", weights_only=False)

  params, buffers = fconvert.wolf_state_from_torch(ckpt["model"], cfg,
                                                   wolf_params)
  ema_sd = fconvert.flow_ema_state_dict_from_torch(ckpt)
  ema_params, _ = fconvert.wolf_state_from_torch(ema_sd, cfg, wolf_params)

  flow_model = create_flow_model(cfg)
  opt = state_lib.make_optimizer(cfg, lr=cfg.flow.lr)
  # init to get the reference pytree STRUCTURE (list-vs-tuple, dtypes),
  # then graft the converted arrays onto it so msgpack round-trips into
  # run_lib.load_flow_model's freshly-initialized state
  init_params, init_buffers = flow_model.init(jax.random.PRNGKey(0))
  params = jax.tree_util.tree_map(
      lambda ref, new: jax.numpy.asarray(new, ref.dtype).reshape(ref.shape),
      init_params, params)
  ema_params = jax.tree_util.tree_map(
      lambda ref, new: jax.numpy.asarray(new, ref.dtype).reshape(ref.shape),
      init_params, ema_params)
  buffers = jax.tree_util.tree_map(
      lambda ref, new: jax.numpy.asarray(new, ref.dtype).reshape(ref.shape),
      init_buffers, buffers)

  state = state_lib.init_train_state(cfg, params, buffers, opt,
                                     jax.random.PRNGKey(0))
  step = int(ckpt.get("step", 0))
  state = state.replace(
      step=jax.numpy.asarray(step, jax.numpy.int32),
      ema_params=ema_params,
      ema_num_updates=jax.numpy.asarray(step, jax.numpy.int32))
  ckpt_lib.save_checkpoint(out_path, jax.device_get(state))
  print(f"wrote {out_path} (step {step})")


if __name__ == "__main__":
  main()
