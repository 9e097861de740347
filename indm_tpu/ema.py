"""Exponential moving average of parameters as pure pytree ops.

Replaces the reference's stateful `ExponentialMovingAverage`
(`/root/reference/models/ema.py:43-98`). The store/copy_to/restore swap
protocol used around eval blocks (`run_lib.py:119-122,131-140`) is
unnecessary in a functional design: evaluation simply *reads*
`state.ema_params` while training keeps updating `state.params`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float, num_updates):
  """One EMA step with warmup-aware decay
  `min(decay, (1+n)/(10+n))` (`models/ema.py:43-46`).

  num_updates is the post-increment update count (traced or static).
  """
  n = jnp.asarray(num_updates, jnp.float32)
  d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
  one_minus = 1.0 - d
  return jax.tree_util.tree_map(
      lambda e, p: e - one_minus * (e - p), ema_params, params)
