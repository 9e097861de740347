"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-device test recipe from SURVEY.md §4(h): sharding logic is
validated on host CPU with `--xla_force_host_platform_device_count`, no real
TPU pod needed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize registers a TPU relay backend and pins
# JAX_PLATFORMS before we run; force the CPU platform explicitly so tests
# never tunnel to real hardware.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: compiles on this stack route through a
# slow remote relay; caching makes repeated suite runs fast.
from indm_tpu import parallel  # noqa: E402

parallel.enable_compilation_cache()


@pytest.fixture(scope="session")
def devices():
  devs = jax.devices()
  assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
  return devs
