"""Rootfinding edge paths: OneStep mode across a root (r_check2 re-check),
repeated solve after a Root return, and exact-zero handling at t0
(r_check1 deactivation)."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus, IdaTask
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.problem import IdaProblem
from ida_tpu.tol_control import tol_sv, tol_ss


def _tol():
    return tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))


def test_onestep_across_root():
    # OneStep mode must interrupt stepping to report the y3 = 0.01 crossing,
    # then continue stepping (r_check2 re-check path runs on the next call)
    ida = IDA(roberts_problem(), ROBERTS_YY0, ROBERTS_YP0, _tol())
    statuses = []
    troot = None
    for _ in range(2000):
        tret, status = ida.solve(1.0e9, itask=IdaTask.OneStep)
        statuses.append(status)
        if status == IdaSolveStatus.Root:
            troot = tret
            break
    assert troot is not None
    np.testing.assert_allclose(troot, 2.6402e-01, rtol=1e-3)
    np.testing.assert_array_equal(ida.get_root_info(), [0, 1])
    # continue past the root in OneStep mode: next calls succeed and advance
    t_prev = troot
    for _ in range(5):
        tret, status = ida.solve(1.0e9, itask=IdaTask.OneStep)
        assert status in (IdaSolveStatus.Success, IdaSolveStatus.Root)
        assert tret > t_prev
        t_prev = tret


def test_root_exactly_zero_at_t0():
    # g2 = y3 - 0 is exactly zero at t0; C semantics: deactivate it at t0,
    # re-activate once it moves off zero, and do NOT report a root at t=0
    def root(t, y, yp):
        return jnp.stack([y[0] - 0.5, y[2]])

    prob = IdaProblem(
        n=3,
        res=roberts_problem().res,
        jac=roberts_problem().jac,
        root=root,
        nroots=2,
    )
    ida = IDA(prob, ROBERTS_YY0, ROBERTS_YP0, _tol())
    tret, status = ida.solve(0.4)
    # y3 grows from exactly 0: must not fire at t0. y1 stays near 1 >> 0.5.
    assert status == IdaSolveStatus.Success
    assert tret == 0.4


def test_two_roots_resolved_in_order():
    # both components cross inside the same horizon; the solver must return
    # them one at a time, nearest first
    ida = IDA(roberts_problem(), ROBERTS_YY0, ROBERTS_YP0, _tol())
    tret1, s1 = ida.solve(4.0e10)
    assert s1 == IdaSolveStatus.Root and tuple(ida.get_root_info()) == (0, 1)
    tret2, s2 = ida.solve(4.0e10)
    assert s2 == IdaSolveStatus.Root and tuple(ida.get_root_info()) == (-1, 0)
    assert tret1 < tret2
    tret3, s3 = ida.solve(4.0e10)
    assert s3 == IdaSolveStatus.Success and tret3 == 4.0e10
