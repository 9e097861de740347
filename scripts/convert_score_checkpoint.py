"""Convert a published reference INDM score checkpoint into indm_tpu's
msgpack format.

  python scripts/convert_score_checkpoint.py <checkpoint.pth> \
      <config-name e.g. vp/CIFAR10/indm_nll> <out.msgpack>

The reference checkpoint (`/root/reference/utils.py:36-48`) is a
torch-pickled dict {optimizer, model, ema, step}; `model` is a
DataParallel state_dict of `models/ncsnpp.py`, `ema` holds shadow_params
ordered like model.parameters(). The output restores into
`run_lib.load_model` via `checkpoint.restore_checkpoint` (params + EMA +
step; the optimizer state starts fresh, like the reference's VE loading
quirk `utils.py:23-24`)."""

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
  import numpy as np  # noqa: F401

  from indm_tpu import checkpoint as ckpt_lib
  from indm_tpu import state as state_lib
  from indm_tpu.configs import get_config
  from indm_tpu.models import create_model
  from indm_tpu.models import convert as convert_lib

  cfg = get_config(cfg_name)
  ckpt = torch.load(in_path, map_location="cpu")

  params, buffers = convert_lib.ncsnpp_params_from_torch(ckpt["model"], cfg)
  ema_sd = convert_lib.ema_state_dict_from_torch(ckpt, cfg)
  ema_params, _ = convert_lib.ncsnpp_params_from_torch(ema_sd, cfg)

  module, variables = create_model(cfg, jax.random.PRNGKey(0))
  opt = state_lib.make_optimizer(cfg)
  init_buffers = {k: v for k, v in variables.items() if k != "params"}
  if buffers:
    init_buffers = dict(init_buffers)
    init_buffers["buffers"] = buffers
  state = state_lib.init_train_state(cfg, params, init_buffers, opt,
                                     jax.random.PRNGKey(0))
  state = state.replace(
      step=jax.numpy.asarray(int(ckpt.get("step", 0)), jax.numpy.int32),
      ema_params=ema_params,
      ema_num_updates=jax.numpy.asarray(int(ckpt.get("step", 0)),
                                        jax.numpy.int32))
  ckpt_lib.save_checkpoint(out_path, jax.device_get(state))
  print(f"wrote {out_path} (step {int(state.step)})")


if __name__ == "__main__":
  main()
