"""Profiling/tracing hooks.

The reference has none (SURVEY.md §5.1 — tqdm bars and a dead tensorboard
dir, `run_lib.py:51-52`). Here: `jax.profiler` trace capture around chosen
step ranges + wall-clock step timing with compile-time separation.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
  """Capture a jax.profiler trace (viewable in TensorBoard/XProf) for the
  enclosed steps; no-op when logdir is None."""
  if not logdir:
    yield
    return
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
    logging.info("profiler trace written to %s", logdir)


class StepTimer:
  """Wall-clock steps/sec with the first (compile) step reported apart."""

  def __init__(self):
    self.reset()

  def reset(self):
    self.t0 = time.time()
    self.steps = 0
    self.compile_time = None

  def tick(self):
    now = time.time()
    if self.compile_time is None:
      self.compile_time = now - self.t0
      self.t0 = now
      return None
    self.steps += 1
    return self.steps / (now - self.t0)

  def rate(self):
    dt = time.time() - self.t0
    return self.steps / dt if dt > 0 else 0.0
