"""IDACalcIC and inequality-constraint tests (beyond-reference features,
SURVEY.md §2.3 in-scope)."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.models import roberts_problem, ROBERTS_YY0
from ida_tpu.tol_control import tol_sv


def _tol():
    return tol_sv(1.0e-4, jnp.array([1e-8, 1e-6, 1e-6]))


def test_calc_ic_ya_ydp():
    # start from an INCONSISTENT state: y3 violates the algebraic constraint
    # y1+y2+y3=1, and y' is wrong. IC_YA_YDP must fix y3 (algebraic) and the
    # differential derivatives.
    yy0_bad = np.array([1.0, 0.0, 0.3])
    yp0_bad = np.array([0.0, 0.0, 0.0])
    ida = IDA(roberts_problem(with_roots=False), yy0_bad, yp0_bad, _tol())
    ida.calc_ic("ya_ydp", tout1=0.4)
    y0, yp0 = ida.get_consistent_ic()
    # algebraic constraint restored, differential y untouched
    np.testing.assert_allclose(y0[0] + y0[1] + y0[2], 1.0, atol=1e-10)
    np.testing.assert_allclose(y0[:2], [1.0, 0.0], atol=1e-12)
    # residual consistent to the IC tolerance (epiccon = 0.01*epcon, loose
    # by design — C IDACalcIC behaves the same)
    np.testing.assert_allclose(yp0[0], -0.04, rtol=5e-3)
    # and the subsequent integration succeeds
    tret, status = ida.solve(0.4)
    assert status == IdaSolveStatus.Success
    np.testing.assert_allclose(
        ida.get_yy(), [9.85172e-01, 3.38639e-05, 1.47943e-02], rtol=1e-3
    )


def test_calc_ic_y_init():
    # given y', recover y. (Note: yp=[-0.04,0.04,0] would force y2=0 where
    # the cj=0 Jacobian is exactly singular — ill-posed for Y_INIT; use a
    # y' with a nonzero y2 solution instead.)
    yy0_bad = np.array([1.0, 1e-5, 0.05])
    yp0 = np.array([-0.05, 0.04, 0.0])
    ida = IDA(roberts_problem(with_roots=False), yy0_bad, yp0, _tol())
    ida.calc_ic("y", tout1=0.4)
    y0, _ = ida.get_consistent_ic()
    # solution of F(y, yp0) = 0: y2 = sqrt(0.01/3e7)
    np.testing.assert_allclose(y0[0] + y0[1] + y0[2], 1.0, atol=1e-7)
    np.testing.assert_allclose(y0[1], np.sqrt(0.01 / 3e7), rtol=1e-2)


def test_constraints_nonnegative():
    # enforce y >= 0 on all components (reference leaves this branch
    # unimplemented!(); C spec at reference src/lib.rs:857-887)
    ida = IDA(
        roberts_problem(with_roots=False),
        ROBERTS_YY0,
        np.array([-0.04, 0.04, 0.0]),
        _tol(),
    )
    ida.set_constraints(np.array([1.0, 1.0, 1.0]))
    iout, tout = 0, 0.4
    while iout < 12:
        tret, status = ida.solve(tout)
        assert status == IdaSolveStatus.Success
        assert np.all(ida.get_yy() >= 0.0), (tret, ida.get_yy())
        iout += 1
        tout *= 10.0
