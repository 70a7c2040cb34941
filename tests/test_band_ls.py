"""linear_solver="band" end-to-end: the C IDA IDABand analogue.

The reference never ported IDABand (its only direct solver is dense,
crates/linear/src/dense.rs); this is a beyond-reference component built on
ops/banded.py. The integrator path is identical to the dense one except
lsetup factors an AD-colored banded Jacobian (mu+ml+1 jvps instead of N)
and lsolve back-substitutes in band storage — so a banded problem solved
with "band" must reproduce the "dense" trajectory up to linear-algebra
rounding."""

import numpy as np
import jax.numpy as jnp
import pytest

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.core.state import IdaOptions
from ida_tpu.models.heat2d import heat2d_problem, heat2d_ic
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.tol_control import tol_ss, tol_sv


def _solve_heat2d(linear_solver, m=8, touts=(0.01, 0.04, 0.16), **kw):
    prob = heat2d_problem(m, use_prec=(linear_solver == "spgmr"))
    u0, up0 = heat2d_ic(m)
    opts = IdaOptions(linear_solver=linear_solver, mxstep=5000, **kw)
    ida = IDA(prob, u0, up0, tol_ss(1e-5, 1e-8), options=opts)
    out = []
    for t in touts:
        tret, status = ida.solve(t)
        assert status == IdaSolveStatus.Success
        out.append(ida.get_yy().copy())
    return ida, out


def test_heat2d_band_vs_dense():
    m = 8
    # the 5-point Laplacian couples (i, j +- 1) and (i +- 1, j): half
    # bandwidth m in the row-major flattening
    ida_d, dense_out = _solve_heat2d("dense", m=m)
    ida_b, band_out = _solve_heat2d("band", m=m, band_mu=m, band_ml=m)
    for ud, ub in zip(dense_out, band_out):
        np.testing.assert_allclose(ub, ud, atol=5e-6)
    assert ida_b.get_num_jac_evals() > 0
    assert ida_b.get_num_steps() <= 2 * ida_d.get_num_steps()


def test_heat2d_band_too_narrow_fails_gracefully():
    # a bandwidth that CANNOT represent the operator (mu=ml=1 misses the
    # +-m neighbors): Newton must degrade (more work) or error out, never
    # silently return a wrong trajectory
    m = 8
    prob = heat2d_problem(m, use_prec=False)
    u0, up0 = heat2d_ic(m)
    opts = IdaOptions(linear_solver="band", band_mu=1, band_ml=1, mxstep=5000)
    ida = IDA(prob, u0, up0, tol_ss(1e-5, 1e-8), options=opts)
    tret, status = ida.solve(0.01)
    if status == IdaSolveStatus.Success:
        # inexact Newton with a truncated Jacobian can still converge —
        # then the f64 error test guarantees the answer, check against dense
        _, dense_out = _solve_heat2d("dense", m=m, touts=(0.01,))
        np.testing.assert_allclose(ida.get_yy(), dense_out[0], atol=5e-5)
        assert ida.get_num_nonlin_solv_iters() > 0


def test_roberts_band_full_bandwidth_matches_dense():
    # N=3 with mu=ml=2: the band IS the dense matrix — canonical statistics
    # must be reproduced exactly modulo LU op-order rounding
    tol = tol_sv(1.0e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(
        roberts_problem(), ROBERTS_YY0, ROBERTS_YP0, tol,
        options=IdaOptions(linear_solver="band", band_mu=2, band_ml=2),
    )
    iout, tout, roots = 0, 0.4, 0
    while iout < 12:
        tret, status = ida.solve(tout)
        if status == IdaSolveStatus.Root:
            roots += 1
        elif status == IdaSolveStatus.Success:
            iout += 1
            tout *= 10.0
        else:
            raise AssertionError(status)
    assert roots == 2
    reference = np.array(
        [5.2083474251394888e-08, 2.0833390772616859e-13, 9.9999994791631752e-01]
    )
    atol = np.array([1e-8, 1e-6, 1e-6])
    ewt = 1.0 / (1e-4 * np.abs(reference) + 10.0 * atol)
    err = np.sqrt(np.mean((ewt * (ida.get_yy() - reference)) ** 2))
    assert err < 1.0
    # same work profile as dense (LU op order differs slightly in band
    # storage, so allow a small band around the canonical 362/537/60)
    assert abs(ida.get_num_steps() - 362) <= 20
    assert abs(ida.get_num_jac_evals() - 60) <= 10


def test_band_ls_mixed_precision():
    # band + ls_precision="single" composes (f32 band factor/solve)
    m = 6
    ida_f, out_f = _solve_heat2d("band", m=m, band_mu=m, band_ml=m)
    ida_s, out_s = _solve_heat2d(
        "band", m=m, band_mu=m, band_ml=m, ls_precision="single"
    )
    for uf, us in zip(out_f, out_s):
        np.testing.assert_allclose(us, uf, atol=2e-5)
