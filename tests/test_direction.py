"""Integration direction and time-origin paths: backward integration
(negative h throughout the coefficient/stop-test logic) and t0 != 0."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.problem import IdaProblem
from ida_tpu.tol_control import tol_ss


def _decay_problem(rate=1.0):
    # y' = -rate * y  (implicit form), solution y(t) = y0 exp(-rate t)
    def res(t, yy, yp):
        return yp + rate * yy

    return IdaProblem(n=2, res=res)


def test_backward_integration():
    # integrate BACKWARD from t0 = 0 to t = -2: y(-2) = y0 * exp(+2)
    y0 = np.array([1.0, 2.0])
    ida = IDA(_decay_problem(), y0, -y0, tol_ss(1e-8, 1e-10))
    tret, status = ida.solve(-2.0)
    assert status == IdaSolveStatus.Success
    assert tret == -2.0
    assert ida.get_last_step() < 0  # negative steps all the way
    np.testing.assert_allclose(ida.get_yy(), y0 * np.exp(2.0), rtol=1e-5)


def test_backward_with_tstop():
    y0 = np.array([1.0, 2.0])
    ida = IDA(_decay_problem(), y0, -y0, tol_ss(1e-8, 1e-10))
    ida.set_stop_time(-0.5)
    tret, status = ida.solve(-2.0)
    assert status == IdaSolveStatus.TStop
    np.testing.assert_allclose(tret, -0.5)
    np.testing.assert_allclose(ida.get_yy(), y0 * np.exp(0.5), rtol=1e-6)


def test_nonzero_t0():
    y0 = np.array([1.0, 2.0])
    ida = IDA(_decay_problem(), y0, -y0, tol_ss(1e-8, 1e-10), t0=5.0)
    tret, status = ida.solve(7.0)
    assert status == IdaSolveStatus.Success
    np.testing.assert_allclose(ida.get_yy(), y0 * np.exp(-2.0), rtol=1e-6)
    assert ida.get_current_time() >= 7.0


def test_early_failure_reports_t0_not_zero():
    """Failures raised before any step report t = t0, not 0 (ADVICE r1)."""
    import pytest
    from ida_tpu import IDA, IdaError
    from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
    from ida_tpu.tol_control import tol_sv

    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0,
              tol, t0=5.0)
    # tout == t0 => ILL_INPUT from the first-call block, before any step
    with pytest.raises(IdaError) as ei:
        ida.solve(5.0)
    assert ei.value.t == 5.0
