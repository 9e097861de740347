"""On-device adaptive RK45 (Dormand-Prince 5(4)) integrator.

The reference drives `scipy.integrate.solve_ivp(..., method='RK45')` from the
host, crossing the numpy<->device boundary twice per function evaluation
(`/root/reference/likelihood.py:94-116`, `sampling.py:596-604`) — the
dominant eval cost (SURVEY.md §3.3). Here the full adaptive loop is a
`lax.while_loop` inside jit: same Butcher tableau, same PI-free step-size
controller and initial-step heuristic as scipy's RK45, so bits/dim and NFE
match the reference within solver noise, with zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand–Prince 5(4) tableau (as used by scipy.integrate.RK45).
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0], np.float64)
_A = np.zeros((6, 6), np.float64)
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
              np.float64)
# Error weights over K[0..6] (k7 = f(t+h, y_new), FSAL).
_E = np.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
               22 / 525, -1 / 40], np.float64)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0  # error_exponent for 4th-order error estimate


class _State(NamedTuple):
  t: jnp.ndarray
  y: jnp.ndarray
  f: jnp.ndarray      # f(t, y) — FSAL slot
  h_abs: jnp.ndarray
  nfe: jnp.ndarray
  rejected: jnp.ndarray  # last trial was rejected (caps next growth at 1)
  done: jnp.ndarray


def _rms_norm(x):
  return jnp.sqrt(jnp.mean(x * x))


def _select_initial_step(fn, t0, y0, f0, direction, rtol, atol):
  """scipy `_ivp.common.select_initial_step` heuristic."""
  scale = atol + jnp.abs(y0) * rtol
  d0 = _rms_norm(y0 / scale)
  d1 = _rms_norm(f0 / scale)
  h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
  y1 = y0 + h0 * direction * f0
  f1 = fn(t0 + h0 * direction, y1)
  d2 = _rms_norm((f1 - f0) / scale) / h0
  h1 = jnp.where(jnp.maximum(d1, d2) <= 1e-15,
                 jnp.maximum(1e-6, h0 * 1e-3),
                 (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 5.0))
  return jnp.minimum(100 * h0, h1)


def solve_rk45(fn: Callable, t0: float, t1: float, y0: jnp.ndarray,
               rtol: float = 1e-5, atol: float = 1e-5,
               max_steps: int = 10000) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Integrate dy/dt = fn(t, y) from t0 to t1 (either direction).

  y0 is a flat (or any-shape) array; fn maps (scalar t, y) -> dy/dt.
  Returns (y(t1), nfe). Runs fully on device under jit.
  """
  t0 = jnp.asarray(t0, y0.dtype)
  t1 = jnp.asarray(t1, y0.dtype)
  # traced-friendly (t0 may be a traced eps_bpd, `evaluation.py:437-440`)
  direction = jnp.where(t1 >= t0, 1.0, -1.0).astype(y0.dtype)

  f0 = fn(t0, y0)
  h_abs = _select_initial_step(fn, t0, y0, f0, direction, rtol, atol)
  init = _State(t=t0, y=y0, f=f0, h_abs=h_abs,
                nfe=jnp.asarray(2, jnp.int32),
                rejected=jnp.asarray(False),
                done=jnp.asarray(False))

  A = [jnp.asarray(a, y0.dtype) for a in _A]
  B = jnp.asarray(_B, y0.dtype)
  C = jnp.asarray(_C, y0.dtype)
  E = jnp.asarray(_E, y0.dtype)

  def attempt_step(t, y, f, h):
    """One RK45 trial step of signed size h. Returns (y_new, f_new, err)."""
    k = [f]
    for s in range(1, 6):
      dy = h * sum(_A[s, j] * k[j] for j in range(s))
      k.append(fn(t + _C[s] * h, y + dy))
    y_new = y + h * sum(_B[j] * k[j] for j in range(6))
    f_new = fn(t + h, y_new)
    k.append(f_new)
    err = h * sum(_E[j] * k[j] for j in range(7))
    return y_new, f_new, err

  def cond(s: _State):
    return jnp.logical_and(~s.done, s.nfe < 6 * max_steps)

  def body(s: _State):
    # clamp step to not overshoot t1
    max_h = jnp.abs(t1 - s.t)
    h_abs = jnp.minimum(s.h_abs, max_h)
    h = h_abs * direction

    y_new, f_new, err = attempt_step(s.t, s.y, s.f, h)
    scale = atol + jnp.maximum(jnp.abs(s.y), jnp.abs(y_new)) * rtol
    err_norm = _rms_norm(err / scale)

    accept = err_norm < 1.0
    grow = jnp.where(err_norm == 0.0, _MAX_FACTOR,
                     jnp.minimum(_MAX_FACTOR,
                                 _SAFETY * err_norm ** _ORDER_EXP))
    # scipy: after a rejection within the same step, growth is capped at 1.
    grow = jnp.where(s.rejected, jnp.minimum(1.0, grow), grow)
    shrink = jnp.maximum(_MIN_FACTOR, _SAFETY * err_norm ** _ORDER_EXP)
    factor = jnp.where(accept, grow, shrink)

    t_next = jnp.where(accept, s.t + h, s.t)
    y_next = jnp.where(accept, y_new, s.y)
    f_next = jnp.where(accept, f_new, s.f)
    h_next = h_abs * factor
    done = direction * (t1 - t_next) <= 0.0
    return _State(t=t_next, y=y_next, f=f_next, h_abs=h_next,
                  nfe=s.nfe + 6, rejected=~accept, done=done)

  out = jax.lax.while_loop(cond, body, init)
  return out.y, out.nfe
