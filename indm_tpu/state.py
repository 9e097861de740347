"""Training state pytrees and optimizer construction.

The reference threads mutable dicts `{optimizer, model, ema, step}`
(`/root/reference/utils.py:61-112`); here the state is an immutable
`flax.struct` pytree carried through one jitted step. Optimizers are optax
chains reproducing `losses.get_optimizer`/`optimization_manager`
(`losses.py:30-62`): Adam/AdamW with the reference's beta2 quirk
(0.999 for Adam, 0.99 for AdamW), linear LR warmup, global-norm grad clip.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
  step: jnp.ndarray                  # int32 scalar
  params: Any
  buffers: Any                       # non-trainable collections (may be {})
  opt_state: Any
  ema_params: Any
  ema_num_updates: jnp.ndarray       # int32 scalar (EMA warmup counter)
  rng: jnp.ndarray                   # PRNG key threaded across steps


def make_optimizer(config, lr: Optional[float] = None,
                   beta1: Optional[float] = None,
                   eps: Optional[float] = None,
                   weight_decay: Optional[float] = None,
                   warmup: Optional[int] = None,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
  """Optax equivalent of `losses.get_optimizer` + `optimization_manager`
  (`losses.py:30-62`)."""
  opt_cfg = config.optim
  lr = opt_cfg.lr if lr is None else lr
  beta1 = opt_cfg.beta1 if beta1 is None else beta1
  eps = opt_cfg.eps if eps is None else eps
  weight_decay = opt_cfg.weight_decay if weight_decay is None else weight_decay
  warmup = opt_cfg.warmup if warmup is None else warmup
  grad_clip = opt_cfg.grad_clip if grad_clip is None else grad_clip

  if warmup > 0:
    schedule = lambda step: lr * jnp.minimum(step / warmup, 1.0)
  else:
    schedule = lr

  parts = []
  if grad_clip >= 0:
    parts.append(optax.clip_by_global_norm(grad_clip))
  if opt_cfg.optimizer == "Adam":
    if weight_decay:
      # torch Adam treats weight_decay as L2 added to the gradient.
      parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=beta1, b2=0.999, eps=eps))
    parts.append(optax.scale_by_learning_rate(schedule))
  elif opt_cfg.optimizer == "AdamW":
    parts.append(optax.scale_by_adam(b1=beta1, b2=0.99, eps=eps))
    if weight_decay:
      parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(schedule))
  else:
    raise NotImplementedError(
        f"Optimizer {opt_cfg.optimizer} not supported yet!")
  return optax.chain(*parts)


def init_train_state(config, params, buffers, optimizer, rng) -> TrainState:
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      buffers=buffers,
      opt_state=optimizer.init(params),
      ema_params=jax.tree_util.tree_map(jnp.array, params),
      ema_num_updates=jnp.zeros((), jnp.int32),
      rng=rng,
  )
