"""Device-mesh data parallelism.

Replaces the reference's `torch.nn.DataParallel` scatter/gather
(`models/utils.py:93`, `flow_models/flow_model.py:109`,
`cleanfid/features.py:57`) with the TPU-native recipe: a
`jax.sharding.Mesh`, batch sharded over the `data` axis, parameters
replicated, one jitted train step. XLA inserts the gradient `psum`s over ICI
automatically from the sharding annotations (SURVEY.md §2.7). Multi-host
scale-out uses the same code after `jax.distributed.initialize()`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def enable_compilation_cache(cache_dir: Optional[str] = None):
  """Persistent XLA compilation cache. On this stack first compiles route
  through a remote-compile relay costing minutes per executable; caching
  makes reruns instant."""
  import os
  cache_dir = cache_dir or os.environ.get(
      "JAX_COMPILATION_CACHE",
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
  try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:  # older jax without the flags
    pass


def get_mesh(devices: Optional[Sequence] = None,
             axis_name: str = DATA_AXIS) -> Mesh:
  devices = jax.devices() if devices is None else list(devices)
  return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
  return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
  """Place a host array with its leading dim split across the mesh."""
  return jax.device_put(batch, batch_sharding(mesh, axis_name))


def replicate(tree, mesh: Mesh):
  """Replicate a pytree (params/state) on every device of the mesh."""
  sharding = replicated_sharding(mesh)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def jit_train_step(step_fn, mesh: Mesh, donate_state: bool = True,
                   axis_name: str = DATA_AXIS):
  """jit a `step(state, batch) -> (state, metrics)` function with the batch
  sharded over the data axis and the state replicated. Gradients reduce over
  ICI via XLA-inserted collectives."""
  in_shardings = (replicated_sharding(mesh), batch_sharding(mesh, axis_name))
  donate = (0,) if donate_state else ()
  return jax.jit(step_fn, in_shardings=in_shardings, donate_argnums=donate)
