"""End-to-end Roberts kinetics: the reference's flagship example
(reference examples/roberts.rs:58-176, itself SUNDIALS idaRoberts_dns).

Drives the full stack — solve loop, BDF order/step control, Newton/LU,
rootfinding, interpolation — across 12 output decades and checks:
  * both root events (y3 = 0.01, then y1 = 1e-4) with correct crossing signs
  * the final state at t=4e10 against the rtol=1e-8 reference solution in
    the WRMS acceptance metric (reference examples/roberts.rs:9-51)
  * run statistics equal to the canonical C idaRoberts_dns output, i.e.
    step-for-step parity with C IDA on this problem
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.tol_control import tol_sv


@pytest.fixture(scope="module")
def run():
    prob = roberts_problem()
    tol = tol_sv(1.0e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(prob, ROBERTS_YY0, ROBERTS_YP0, tol)

    roots = []
    outputs = []
    iout, tout = 0, 0.4
    while iout < 12:
        tret, status = ida.solve(tout)
        if status == IdaSolveStatus.Root:
            roots.append((tret, tuple(ida.get_root_info())))
        elif status == IdaSolveStatus.Success:
            outputs.append((tret, ida.get_yy().copy()))
            iout += 1
            tout *= 10.0
        else:
            raise AssertionError(f"unexpected status {status}")
    return ida, roots, outputs


def test_root_events(run):
    _, roots, _ = run
    assert len(roots) == 2
    # first root: y3 crosses 0.01 increasing at t ~ 0.264 (C: 2.6403e-01)
    t1, ir1 = roots[0]
    assert ir1 == (0, 1)
    np.testing.assert_allclose(t1, 2.6402e-01, rtol=1e-3)
    # second root: y1 crosses 1e-4 decreasing at t ~ 2.08e7 (C: 2.0793e+07)
    t2, ir2 = roots[1]
    assert ir2 == (-1, 0)
    np.testing.assert_allclose(t2, 2.0788e7, rtol=1e-2)


def test_final_state_acceptance(run):
    # reference examples/roberts.rs:9-51 (check_ans): WRMS error < 1 against
    # the rtol=1e-8/atol=1e-14 reference solution, with loosened weights
    ida, _, outputs = run
    reference = np.array(
        [5.2083474251394888e-08, 2.0833390772616859e-13, 9.9999994791631752e-01]
    )
    atol = np.array([1e-8, 1e-6, 1e-6])
    ewt = 1.0 / (1e-4 * np.abs(reference) + 10.0 * atol)
    t_final, y_final = outputs[-1]
    assert t_final == 4.0e10
    err = np.sqrt(np.mean((ewt * (y_final - reference)) ** 2))
    assert err < 1.0


def test_canonical_statistics(run):
    # The canonical C idaRoberts_dns output (printed, not asserted, by
    # reference examples/roberts.rs:141-165). Matching these EXACTLY means
    # the integrator takes the same steps, orders and Newton iterations as
    # C IDA on this problem.
    ida, _, _ = run
    assert ida.get_num_steps() == 362
    assert ida.get_num_res_evals() == 537
    assert ida.get_num_jac_evals() == 60
    assert ida.get_num_nonlin_solv_iters() == 537
    assert ida.get_num_err_test_fails() == 15
    assert ida.get_num_nonlin_solv_conv_fails() == 0
    assert ida.get_num_g_evals() == 404


def test_output_trajectory(run):
    # spot-check a few output rows against this build's own first validated
    # run (regression guard; values agree with C IDA to print precision)
    _, _, outputs = run
    t, y = outputs[0]
    assert t == 0.4
    np.testing.assert_allclose(y, [9.85172e-01, 3.38639e-05, 1.47943e-02], rtol=1e-4)
    t, y = outputs[5]
    np.testing.assert_allclose(y, [3.89915e-02, 1.62212e-07, 9.61008e-01], rtol=1e-4)
