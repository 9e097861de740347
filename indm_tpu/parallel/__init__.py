"""Device-mesh data parallelism.

Replaces the reference's `torch.nn.DataParallel` scatter/gather
(`models/utils.py:93`, `flow_models/flow_model.py:109`,
`cleanfid/features.py:57`) with the TPU-native recipe: a
`jax.sharding.Mesh`, batch sharded over the `data` axis, parameters
replicated, one jitted train step. XLA inserts the gradient `psum`s over ICI
automatically from the sharding annotations (SURVEY.md §2.7).

Multi-host: call `initialize_distributed()` before any other JAX use; the
mesh then spans every process's devices (collectives ride ICI within a
slice and DCN across hosts), each process feeds ONLY its own contiguous
shard of the global batch (`host_local_slice`), and `shard_batch` builds
the global array from process-local data via
`jax.make_array_from_process_local_data`. Single-process behavior is
unchanged. The shard arithmetic is unit-tested
(`tests/test_multihost.py`); real multi-process runs need a multi-host
environment this image does not provide.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
  """Multi-host entry point: wraps `jax.distributed.initialize` (the
  TPU-native replacement for the reference's dead NCCL DDP,
  `/root/reference/flow_models/wolf/wolf.py:169-175`). On TPU pods the
  arguments are discovered from the environment; pass them explicitly for
  manual clusters. No-op (returns 1) when already initialized or when no
  coordinator is configured — single-process runs stay untouched."""
  import os
  # Explicit opt-in ONLY: a coordinator address (argument or env).
  # TPU_WORKER_HOSTNAMES is NOT a trigger — single-host TPU VMs set it too,
  # and jax.process_count() below initializes the backend, after which
  # jax.distributed.initialize() always raises.
  has_cfg = (coordinator_address is not None
             or os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
  if not has_cfg:
    return jax.process_count()
  kwargs = {}
  if coordinator_address is not None:
    kwargs["coordinator_address"] = coordinator_address
  if num_processes is not None:
    kwargs["num_processes"] = num_processes
  if process_id is not None:
    kwargs["process_id"] = process_id
  try:
    jax.distributed.initialize(**kwargs)
  except RuntimeError as e:
    # Backend already initialized (e.g. a library touched jax first):
    # proceed with whatever process topology is live instead of crashing a
    # single-process run.
    import logging
    logging.warning("initialize_distributed: %s — continuing with "
                    "process_count=%d", e, jax.process_count())
  return jax.process_count()


def host_local_slice(global_batch_size: int,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
  """(start, count) of THIS process's contiguous shard of the global
  batch. Per-host data sharding: process p loads examples
  [p*count, (p+1)*count) of each global batch, matching the contiguous
  device order of a 1-D mesh built from `jax.devices()` (process-major).
  Pure arithmetic — unit-testable without a cluster."""
  np_ = jax.process_count() if num_processes is None else num_processes
  pid = jax.process_index() if process_id is None else process_id
  if global_batch_size % np_ != 0:
    raise ValueError(
        f"global batch {global_batch_size} must divide process count {np_}")
  count = global_batch_size // np_
  return pid * count, count


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
  """Place a batch with its leading dim split across the mesh.

  Single-process: a plain sharded device_put of the full global array.
  Multi-process: `batch` is this process's LOCAL shard (see
  `host_local_slice`); the global array is assembled without any
  cross-host data movement via make_array_from_process_local_data."""
  sharding = batch_sharding(mesh, axis_name)
  if jax.process_count() > 1:
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(batch))
  return jax.device_put(batch, sharding)


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
