"""Driver-entry regression tests.

`__graft_entry__.dryrun_multichip` is the graded multi-chip gate (it failed
in round 1 by initializing the TPU relay backend instead of a virtual CPU
mesh). Exercising it from the suite keeps it from rotting: conftest.py has
already forced the 8-device CPU platform, so `_force_virtual_cpu_mesh` takes
the already-initialized fallback path and the full joint step must still run.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import pytest

# the driver compile-checks both entry points on every round; in-suite
# they are full joint-step compiles (~3 min) -> slow
pytestmark = pytest.mark.slow


def test_dryrun_multichip_runs_on_virtual_mesh():
  import __graft_entry__ as g

  assert jax.device_count() == 8
  g.dryrun_multichip(8)  # raises on any failure


def test_entry_returns_jittable_fn():
  import __graft_entry__ as g

  fn, args = g.entry()
  # Compile-check only (abstract eval): full-size NCSN++ eager CPU forward is
  # slow; the driver separately executes this on the real chip.
  out = jax.eval_shape(fn, *args)
  assert out.shape == args[1].shape
