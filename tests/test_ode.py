"""On-device RK45 vs scipy solve_ivp parity (SURVEY.md §7.3 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indm_tpu import ode

scipy_integrate = pytest.importorskip("scipy.integrate")


def test_exponential_decay_forward():
  fn = lambda t, y: -y
  y0 = jnp.ones((4,))
  y, nfe = jax.jit(lambda y0: ode.solve_rk45(fn, 0.0, 2.0, y0))(y0)
  np.testing.assert_allclose(np.asarray(y), np.exp(-2.0), rtol=1e-4)
  assert int(nfe) > 6


def test_backward_integration():
  fn = lambda t, y: -y
  y0 = jnp.ones((3,))
  y, _ = jax.jit(lambda y0: ode.solve_rk45(fn, 1.0, 0.0, y0))(y0)
  # integrating dy/dt=-y backwards from t=1 to 0 multiplies by e^{+1}
  np.testing.assert_allclose(np.asarray(y), np.e, rtol=1e-4)


def test_matches_scipy_rk45_nonlinear():
  """Stiff-ish nonlinear ODE: trajectory and NFE should match scipy closely
  with the same controller."""

  def f_np(t, y):
    return np.array([y[1], -np.sin(y[0]) - 0.1 * y[1]])

  def f_jnp(t, y):
    return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

  y0 = np.array([1.5, 0.0], np.float32)
  sol = scipy_integrate.solve_ivp(f_np, (0.0, 10.0), y0, rtol=1e-5,
                                  atol=1e-5, method="RK45")
  y_sp = sol.y[:, -1]
  y_jx, nfe = jax.jit(
      lambda y0: ode.solve_rk45(f_jnp, 0.0, 10.0, y0, rtol=1e-5, atol=1e-5)
  )(jnp.asarray(y0))
  np.testing.assert_allclose(np.asarray(y_jx), y_sp, atol=2e-4)
  # NFE within 40% of scipy's (f32 vs f64 step-size noise)
  assert abs(int(nfe) - sol.nfev) / sol.nfev < 0.4
