"""Rarely-taken status lanes: TOO_MUCH_ACC, BAD_EWT (t0 + mid-run),
CLOSE_ROOTS.

VERDICT r4 flagged these lanes as never exercised by the suite. Each test
drives the lane through the public API; CLOSE_ROOTS is additionally
differential-tested against the native C++ oracle (whose Rcheck2 mirrors
C ida.c). Behavioural spec: reference impl_solve.rs:266-308 (ewt refresh +
tolsf accuracy test) and impl_r_check.rs:117-209 (close-pair error);
error codes reference error.rs:17-126.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import IDA, IdaError, IdaOptions, IdaProblem
from ida_tpu import constants as C
from ida_tpu.tol_control import tol_ss, tol_sv


def _growth(n=1):
    # y' = y  =>  res = yp - yy; grows e^t so |y|*eps eventually dwarfs atol
    return IdaProblem(n=1, res=lambda t, yy, yp: yp - yy)


def test_too_much_acc_mid_run():
    """tolsf = eps * ||phi0||_wrms > 1 mid-run must abort with TOO_MUCH_ACC
    and leave the recommended rtol/atol scale in get_tol_scale_factor()
    (reference impl_solve.rs:289-308)."""
    ida = IDA(_growth(), jnp.asarray([1.0]), jnp.asarray([1.0]),
              tol_ss(0.0, 1e-6), options=IdaOptions(mxstep=50000))
    # y = e^t crosses atol/eps ~ 4.5e9 near t ~ 22.2: well inside (0, 40).
    # Pure-absolute control means ~eps-relative demand on the approach, so
    # steps shrink hard near the wall — mxstep is raised to let the lane
    # trigger on accuracy, not on work.
    with pytest.raises(IdaError) as ei:
        ida.solve(40.0)
    assert ei.value.code == C.TOO_MUCH_ACC
    assert ida.get_num_steps() > 0  # genuinely mid-run, not an input check
    assert float(ida.get_current_time()) > 1.0
    assert ida.get_tol_scale_factor() > 1.0  # the suggested scaling factor


def test_bad_ewt_at_first_call():
    """atol = 0 with a zero initial component makes the C ewt denominator
    rtol*|y|+atol exactly 0 => BAD_EWT at the first call (C IDAEwtSet
    'min <= 0' check; here it surfaces as ewt = inf)."""
    prob = IdaProblem(n=1, res=lambda t, yy, yp: yp - 1.0)
    ida = IDA(prob, jnp.asarray([0.0]), jnp.asarray([1.0]), tol_ss(1e-4, 0.0))
    with pytest.raises(IdaError) as ei:
        ida.solve(1.0)
    assert ei.value.code == C.BAD_EWT
    assert ida.get_num_steps() == 0


def test_bad_ewt_mid_run():
    """A weight that turns nonpositive after steps have been taken must
    abort with BAD_EWT from the per-step refresh, not the t0 check. Decay
    y' = -y with a negative atol keeps rtol*|y|+atol > 0 at t0 (0.005) and
    drives it negative once y < 0.5 (t > ln 2) — the same lane a poisoned
    user ewt function hits in C IDA."""
    prob = IdaProblem(n=1, res=lambda t, yy, yp: yp + yy)
    ida = IDA(prob, jnp.asarray([1.0]), jnp.asarray([-1.0]),
              tol_ss(1e-2, -5e-3))
    with pytest.raises(IdaError) as ei:
        ida.solve(5.0)
    assert ei.value.code == C.BAD_EWT
    assert ida.get_num_steps() > 0
    assert float(ida.get_current_time()) > 0.3


# --- CLOSE_ROOTS: g exactly 0.0 at the returned root AND at the r_check2
# probe point tlo + smallh (reference impl_r_check.rs:117-209 CloseRoots) ---

def _flat_zero_problem():
    # trivial dynamics y = t; root fn max(0, 0.5 - t) is +ve then EXACTLY
    # 0.0 on [0.5, inf): the re-check at the root finds a second exact zero
    return IdaProblem(
        n=1,
        res=lambda t, yy, yp: yp - 1.0,
        root=lambda t, yy, yp: jnp.asarray([jnp.maximum(0.0, 0.5 - t)]),
        nroots=1,
    )


def test_close_roots_jax():
    ida = IDA(_flat_zero_problem(), jnp.asarray([0.0]), jnp.asarray([1.0]),
              tol_ss(1e-6, 1e-8))
    tret, status = ida.solve(1.0)
    assert status.name == "Root"
    assert float(tret) >= 0.5
    # re-entry: r_check2 sees the SAME component exactly zero at tlo and at
    # the probe point => CloseRoots error
    with pytest.raises(IdaError) as ei:
        ida.solve(1.0)
    assert ei.value.code == C.CLOSE_ROOTS


def test_close_roots_native_oracle_differential():
    """The native oracle's Rcheck2 must classify the identical scenario as
    CLOSE_ROOTS (solve_roots return 3) — cross-engine agreement on the
    close-pair taxonomy."""
    from ida_tpu.native import oracle_solve_roots

    ret, _, events, _ = oracle_solve_roots(
        lambda t, y, yp: np.array([yp[0] - 1.0]),
        lambda t, cj, y, yp, r: np.array([[cj]]),
        lambda t, y, yp: np.array([max(0.0, 0.5 - t)]),
        1,
        np.array([0.0]), np.array([1.0]), [1.0], 1e-6, np.array([1e-8]),
    )
    assert ret == 3  # CLOSE_ROOTS
    assert len(events) == 1 and events[0][0] >= 0.5
