"""Recoverable residual / linear-solve failure taxonomy (VERDICT r3 item 4).

The reference carries ``Recoverable::{Residual, LSetup, LSolve}`` kinds
(reference src/error.rs:3-15) and its res hook can fail recoverably
(src/ida_nls.rs:118-153); C IDA retries a recoverable residual failure at
h/4 and returns IDA_REP_RES_ERR after maxncf repeats. In this framework
user callbacks are pure functions with no return-flag channel, so the
failure signal is the residual VALUE: any non-finite entry marks the
evaluation recoverably failed (core/nls.py ``_res_ok``). The native C++
oracle implements the SAME rule, so the retry policy and counters are
differentially testable engine-vs-oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import constants as C
from ida_tpu.problem import IdaProblem
from ida_tpu.core.state import IdaOptions
from ida_tpu.solver import IDA, IdaError, IdaSolveStatus
from ida_tpu.tol_control import tol_sv

BOMB_THRESH = -0.5


def _np_res(t, y, yp, bomb=True):
    r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
    r1 = -r0 - 3.0e7 * y[1] * y[1] - yp[1]
    r = np.array([r0 - yp[0], r1, y[0] + y[1] + y[2] - 1.0])
    if bomb and (y < BOMB_THRESH).any():
        return np.full(3, np.nan)
    return r


def _np_jac(t, cj, y, yp, r):
    return np.array(
        [
            [-0.04 - cj, 1.0e4 * y[2], 1.0e4 * y[1]],
            [0.04, -1.0e4 * y[2] - 6.0e7 * y[1] - cj, -1.0e4 * y[1]],
            [1.0, 1.0, 1.0],
        ]
    )


def _bombed_roberts():
    """Roberts whose residual overflows (NaN) when the predictor undershoots
    y < -100 — which an hin=100 first step guarantees (phi[1] = h*yp0 makes
    the predictor y1 = 1 - 4 < -0.5). The same analytic Jacobian as the oracle's
    so the Newton work matches step for step."""

    def res(t, yy, yp):
        r0 = -0.04 * yy[0] + 1.0e4 * yy[1] * yy[2]
        r1 = -r0 - 3.0e7 * yy[1] ** 2 - yp[1]
        r = jnp.stack([r0 - yp[0], r1, yy[0] + yy[1] + yy[2] - 1.0])
        bomb = jnp.any(yy < BOMB_THRESH, axis=0)
        return jnp.where(bomb, jnp.nan, r)

    def jac(t, cj, yy, yp, rr):
        z = jnp.zeros_like(yy[0])
        one = jnp.ones_like(yy[0])
        return jnp.stack(
            [
                jnp.stack([-0.04 - cj * one, 1.0e4 * yy[2], 1.0e4 * yy[1]]),
                jnp.stack(
                    [0.04 * one, -1.0e4 * yy[2] - 6.0e7 * yy[1] - cj, -1.0e4 * yy[1]]
                ),
                jnp.stack([one, one, one]),
            ]
        )

    return IdaProblem(n=3, res=res, jac=jac)


def _tol():
    return tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))


Y0 = jnp.asarray([1.0, 0.0, 0.0])
YP0 = jnp.asarray([-0.04, 0.04, 0.0])


def test_res_failure_recovers_and_matches_oracle():
    """A residual that overflows at a too-large h: the solver must classify
    it REC_RESIDUAL, retry at h/4 (C IDAHandleNFlag policy), recover, and
    agree with the native oracle on the whole failure bookkeeping."""
    from ida_tpu.native import oracle_solve

    ida = IDA(_bombed_roberts(), Y0, YP0, _tol())
    ida.set_initial_step(100.0)
    tret, status = ida.solve(0.4)
    assert status == IdaSolveStatus.Success
    # the recoverable-residual path actually fired (counted through ncfn,
    # as in C where RES_RECVR increments the conv-fail counter)
    assert ida.get_num_nonlin_solv_conv_fails() >= 1

    ret, y_out, stats = oracle_solve(
        _np_res, _np_jac, np.asarray(Y0), np.asarray(YP0),
        [0.4], 1e-4, np.array([1e-8, 1e-6, 1e-6]), hin=100.0,
    )
    assert ret == 0
    np.testing.assert_allclose(np.asarray(ida.get_yy()), y_out[-1], rtol=1e-9)
    assert stats["nst"] == ida.get_num_steps()
    assert stats["nni"] == ida.get_num_nonlin_solv_iters()
    assert stats["ncfn"] == ida.get_num_nonlin_solv_conv_fails()
    assert stats["netf"] == ida.get_num_err_test_fails()


def test_res_failure_trajectory_unchanged_after_recovery():
    """Post-recovery the bombed problem must land on the plain Roberts
    trajectory (the bomb only ever fires on rejected attempts). The two
    runs take different step sequences (hin=100 + failures vs the h0
    heuristic), so agreement is bounded by the rtol=1e-4 integration
    tolerance, not roundoff — measured 4e-5."""
    ida_b = IDA(_bombed_roberts(), Y0, YP0, _tol())
    ida_b.set_initial_step(100.0)
    ida_b.solve(0.4)

    from ida_tpu.models import roberts_problem

    ida_p = IDA(roberts_problem(with_roots=False), Y0, YP0, _tol())
    ida_p.solve(0.4)
    np.testing.assert_allclose(
        np.asarray(ida_b.get_yy()), np.asarray(ida_p.get_yy()), rtol=1e-3
    )


def test_persistent_res_failure_returns_rep_res_err():
    """A residual that NEVER evaluates finite: h/4 retries exhaust maxncf
    and the fatal code is REP_RES_ERR (C IDA_REP_RES_ERR = -9), not the
    generic CONV_FAIL — with the oracle agreeing."""
    from ida_tpu.native import oracle_solve

    prob = IdaProblem(
        n=2,
        res=lambda t, yy, yp: jnp.full_like(yy, jnp.nan),
        jac=lambda t, cj, yy, yp, rr: jnp.eye(2, dtype=yy.dtype),
    )
    ida = IDA(prob, jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 0.0]),
              tol_sv(1e-6, jnp.asarray([1e-8, 1e-8])))
    with pytest.raises(IdaError) as ei:
        ida.solve(1.0)
    assert ei.value.code == C.REP_RES_ERR
    # no Newton iteration ever ran (predictor residual failure is terminal
    # per attempt), but every attempt was counted as a convergence failure
    assert ida.get_num_nonlin_solv_iters() == 0
    assert ida.get_num_nonlin_solv_conv_fails() == C.MXNCF

    ret, _, stats = oracle_solve(
        lambda t, y, yp: np.full(2, np.nan),
        lambda t, cj, y, yp, r: np.eye(2),
        np.array([1.0, 2.0]), np.zeros(2), [1.0], 1e-6, np.array([1e-8, 1e-8]),
    )
    assert ret == C.REP_RES_ERR
    assert stats["nni"] == 0
    assert stats["ncfn"] == C.MXNCF


def test_nonfinite_jacobian_is_lsetup_recoverable():
    """A non-finite (but finite-residual) Jacobian must take the
    LSETUP_RECVR lane and, persisting, return LSETUP_FAIL (-6) — the NaN
    factor must never be back-substituted as if valid."""
    prob = IdaProblem(
        n=2,
        res=lambda t, yy, yp: yp + yy,
        jac=lambda t, cj, yy, yp, rr: jnp.full((2, 2), jnp.nan, yy.dtype),
    )
    ida = IDA(prob, jnp.asarray([1.0, 2.0]), jnp.asarray([-1.0, -2.0]),
              tol_sv(1e-6, jnp.asarray([1e-8, 1e-8])))
    with pytest.raises(IdaError) as ei:
        ida.solve(1.0)
    assert ei.value.code == C.LSETUP_FAIL


def test_stalled_linear_solver_returns_lsolve_fail():
    """A linear solver that can never meet its tolerance (zero jtimes
    operator + an unreachably tight eplifac) must be classified
    REC_LSOLVE per iteration and return LSOLVE_FAIL (-7) at maxncf —
    the kind the reference declares (error.rs:8) but never produces."""
    prob = IdaProblem(
        n=2,
        res=lambda t, yy, yp: yp + yy,
        jtimes_fn=lambda jdata, t, cj, yy, yp, v: jnp.zeros_like(v),
    )
    opts = IdaOptions(linear_solver="spgmr", mxstep=50, eplifac=1e-12)
    ida = IDA(prob, jnp.asarray([1.0, 2.0]), jnp.asarray([-1.0, -2.0]),
              tol_sv(1e-6, jnp.asarray([1e-10, 1e-10])), options=opts)
    with pytest.raises(IdaError) as ei:
        ida.solve(1.0)
    assert ei.value.code == C.LSOLVE_FAIL
    assert ida.get_num_lin_conv_fails() >= C.MXNCF
