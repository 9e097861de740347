"""Checkpoint save/restore: one msgpack pytree per stream.

Replaces the torch-pickled `{optimizer, model, ema, step}` dicts of
`/root/reference/utils.py:14-48` with `flax.serialization` msgpack of the
whole `TrainState` (params + opt state + EMA + step + RNG + buffers).
Semantics preserved:
  * rolling meta checkpoint for preemption + numbered snapshots
    (`run_lib.py:102-114`);
  * silent fresh-state return when no checkpoint exists (`utils.py:14-19`) —
    automatic resume-from-preemption;
  * optimizer state is NOT restored for VE (`utils.py:23-24`);
  * `optim.reset` re-initializes the optimizer after restore
    (`utils.py:98-100`).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import flax.serialization
import jax


def save_checkpoint(ckpt_path: str, state) -> None:
  os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
  data = flax.serialization.to_bytes(jax.device_get(state))
  tmp = ckpt_path + ".tmp"
  with open(tmp, "wb") as f:
    f.write(data)
  os.replace(tmp, ckpt_path)


def restore_checkpoint(config, ckpt_path: str, state,
                       keep_optimizer: Optional[bool] = None):
  """Load `ckpt_path` into `state` (a template with the right structure).
  Returns the input state unchanged if the file does not exist."""
  if not os.path.exists(ckpt_path):
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
    logging.warning("No checkpoint found at %s. "
                    "Returned the same state as input", ckpt_path)
    return state
  logging.info("%s loaded ...", ckpt_path)
  with open(ckpt_path, "rb") as f:
    loaded = flax.serialization.from_bytes(state, f.read())
  if keep_optimizer is None:
    keep_optimizer = config.training.sde != "vesde"
  if not keep_optimizer:
    loaded = loaded.replace(opt_state=state.opt_state)
  return loaded
