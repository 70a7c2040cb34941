"""Option and failure-path coverage: rootdir filtering, mxstep guard,
explicit initial step, tolsf on failure statuses."""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import IDA, IdaError, IdaOptions, IdaSolveStatus
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.tol_control import tol_sv


def _tol():
    return tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))


def _ida(**kw):
    return IDA(roberts_problem(), ROBERTS_YY0, ROBERTS_YP0, _tol(), **kw)


def test_rootdir_filters_crossings():
    # y3 crosses 0.01 INCREASING at t~0.264. rootdir = -1 on that component
    # must suppress it (reference rootdir semantics, impl_r_check.rs:292-296)
    ida = _ida()
    ida.set_root_direction([0, -1])
    tret, status = ida.solve(0.4)
    assert status == IdaSolveStatus.Success  # no root reported
    assert tret == 0.4

    # +1 (increasing only) must still find it
    ida2 = _ida()
    ida2.set_root_direction([0, 1])
    tret2, status2 = ida2.solve(0.4)
    assert status2 == IdaSolveStatus.Root
    np.testing.assert_allclose(tret2, 2.6402e-01, rtol=1e-3)


def test_mxstep_guard():
    ida = IDA(
        roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, _tol(),
        options=IdaOptions(mxstep=5),
    )
    with pytest.raises(IdaError) as ei:
        ida.solve(4.0e10)
    assert ei.value.name == "TOO_MUCH_WORK"
    # the state still holds the solution at the point it stopped
    assert 0 < ida.get_current_time() < 4.0e10
    assert ida.get_num_steps() == 5


def test_explicit_initial_step():
    ida = _ida()
    ida.set_initial_step(1e-6)
    ida.solve(0.4)
    np.testing.assert_allclose(ida.get_actual_init_step(), 1e-6)


def test_initial_step_wrong_direction():
    ida = _ida()
    ida.set_initial_step(-1e-6)  # backwards vs tout > t0
    with pytest.raises(IdaError) as ei:
        ida.solve(0.4)
    assert ei.value.name == "ILL_INPUT"


def test_enable_constraints_false_is_bit_identical():
    """IdaOptions(enable_constraints=False) skips tracing the inequality-
    constraint block (C IDA's constraintsSet branch, made static). For a
    constraint-free problem the block is an exact identity, so the whole
    trajectory AND every counter must match the default program bit for
    bit."""
    ida_on = _ida()
    ida_off = _ida(options=IdaOptions(enable_constraints=False))
    t1, s1 = ida_on.solve(400.0)
    t2, s2 = ida_off.solve(400.0)
    assert s1 == s2 and float(t1) == float(t2)
    assert np.array_equal(np.asarray(ida_on.get_yy()), np.asarray(ida_off.get_yy()))
    assert ida_on.get_num_steps() == ida_off.get_num_steps()
    assert ida_on.get_num_nonlin_solv_iters() == ida_off.get_num_nonlin_solv_iters()
    assert ida_on.get_num_err_test_fails() == ida_off.get_num_err_test_fails()


def test_enable_constraints_false_rejects_set_constraints():
    ida = _ida(options=IdaOptions(enable_constraints=False))
    with pytest.raises(ValueError):
        ida.set_constraints([1.0, 1.0, 1.0])


def test_first_step_failure_preserves_y0():
    """An over-optimistic explicit hin makes the FIRST step attempt fail, so
    the nst == 0 reset path fires (psi[0] = hh, phi[1] *= rr — C IDAReset).

    DELIBERATE DEVIATION regression: the reference's reset scales the WHOLE
    phi array (src/lib.rs:1249-1252) including phi[0] = y0, compounding the
    corruption on every retry; replicating it makes this exact config fail
    with ERR_FAIL at t = 0 (measured before the fix). C IDA rescales only
    phi[1]; with that semantics the solver recovers cleanly and the native
    oracle (same semantics) agrees on the trajectory and the failure
    statistics."""
    from ida_tpu.native import oracle_solve

    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, _tol())
    ida.set_initial_step(1.0)
    tret, status = ida.solve(0.4)
    assert status == IdaSolveStatus.Success
    # the reset path actually fired: first-step convergence failures
    assert ida.get_num_nonlin_solv_conv_fails() >= 1

    def np_res(t, y, yp):
        r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
        r1 = -r0 - 3.0e7 * y[1] * y[1] - yp[1]
        return np.array([r0 - yp[0], r1, y[0] + y[1] + y[2] - 1.0])

    def np_jac(t, cj, y, yp, r):
        return np.array(
            [
                [-0.04 - cj, 1.0e4 * y[2], 1.0e4 * y[1]],
                [0.04, -1.0e4 * y[2] - 6.0e7 * y[1] - cj, -1.0e4 * y[1]],
                [1.0, 1.0, 1.0],
            ]
        )

    ret, y_out, stats = oracle_solve(
        np_res, np_jac, np.array([1.0, 0.0, 0.0]), np.array([-0.04, 0.04, 0.0]),
        [0.4], 1e-4, np.array([1e-8, 1e-6, 1e-6]), hin=1.0,
    )
    assert ret == 0
    np.testing.assert_allclose(np.asarray(ida.get_yy()), y_out[-1], rtol=1e-9)
    assert stats["nst"] == ida.get_num_steps()
    assert stats["ncfn"] == ida.get_num_nonlin_solv_conv_fails()
    assert stats["netf"] == ida.get_num_err_test_fails()
