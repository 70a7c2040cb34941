"""Mixed-precision linear-solver mode (``IdaOptions.ls_precision="single"``).

Beyond-reference capability (NEXT.md round-3 lever 1b): the Jacobian
evaluation + LU factor/solve (dense) or the whole Krylov iteration (spgmr)
run in float32 inside the f64 Newton loop. This is an inexact-Newton
scheme: the Newton fixed point (residual -> 0 at the f64 corrected state)
and the f64 local error test are untouched, so trajectories must stay
within the requested tolerances — but step counts are NOT step-parity with
C IDA (the reference has no such mode; its closest analogue is the
single-vs-double `IdaConst` genericity at src/constants.rs:34-112, which
changes the WHOLE solver's precision rather than just the linear solve).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.core.state import IdaOptions
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.models.heat2d import heat2d_problem, heat2d_ic
from ida_tpu.tol_control import tol_sv, tol_ss


def _run_roberts(ls_precision):
    prob = roberts_problem()
    tol = tol_sv(1.0e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(
        prob, ROBERTS_YY0, ROBERTS_YP0, tol,
        options=IdaOptions(ls_precision=ls_precision),
    )
    roots, outputs = [], []
    iout, tout = 0, 0.4
    while iout < 12:
        tret, status = ida.solve(tout)
        if status == IdaSolveStatus.Root:
            roots.append((float(tret), tuple(ida.get_root_info())))
        elif status == IdaSolveStatus.Success:
            outputs.append((float(tret), ida.get_yy().copy()))
            iout += 1
            tout *= 10.0
        else:
            raise AssertionError(f"unexpected status {status}")
    return ida, roots, outputs


@pytest.fixture(scope="module")
def roberts_single():
    return _run_roberts("single")


def test_roberts_single_final_state(roberts_single):
    # same acceptance as the reference check_ans (examples/roberts.rs:9-51):
    # WRMS error < 1 against the rtol=1e-8 reference solution
    _, _, outputs = roberts_single
    reference = np.array(
        [5.2083474251394888e-08, 2.0833390772616859e-13, 9.9999994791631752e-01]
    )
    atol = np.array([1e-8, 1e-6, 1e-6])
    ewt = 1.0 / (1e-4 * np.abs(reference) + 10.0 * atol)
    t_final, y_final = outputs[-1]
    assert t_final == 4.0e10
    err = np.sqrt(np.mean((ewt * (y_final - reference)) ** 2))
    assert err < 1.0


def test_roberts_single_roots(roberts_single):
    # both canonical root events survive the inexact Newton
    _, roots, _ = roberts_single
    assert len(roots) == 2
    t1, ir1 = roots[0]
    assert ir1 == (0, 1)
    np.testing.assert_allclose(t1, 2.6402e-01, rtol=1e-3)
    t2, ir2 = roots[1]
    assert ir2 == (-1, 0)
    np.testing.assert_allclose(t2, 2.0788e7, rtol=1e-2)


def test_roberts_single_vs_full_trajectory(roberts_single):
    # every output row of the mixed run stays close to the full-precision
    # run in the check_ans metric (solver ewt weights, 10x-slack atol).
    # Two runs at rtol=1e-4 with different step sequences each carry a
    # global error of a few times the local tolerance, so the cross-run
    # difference is O(few), not O(1e-8): measured max ~2 at t=4e5.
    # The bound 10 catches convergence-quality regressions (a broken f32
    # solve produces O(100+) here) without asserting step-parity.
    _, _, out_s = roberts_single
    _, _, out_f = _run_roberts("full")
    atol = np.array([1e-8, 1e-6, 1e-6])
    for (ts, ys), (tf, yf) in zip(out_s, out_f):
        assert ts == tf
        ewt = 1.0 / (1e-4 * np.abs(yf) + 10.0 * atol)
        err = np.sqrt(np.mean((ewt * (ys - yf)) ** 2))
        assert err < 10.0, (ts, err)


def test_roberts_single_statistics_sane(roberts_single):
    # Not step-parity (by design), and Roberts is a WORST CASE for an f32
    # linear solve: in the late decades cond(J) ~ 1e9 exceeds 1/eps_f32, so
    # the f32 LU loses all significance there and Newton retries with fresh
    # (equally f32) Jacobians — measured on CPU: nst 437 (+21% vs the
    # canonical 362), nje 194 (vs 60), ncfn 45 (vs 0), yet the f64 error
    # test still delivers an in-tolerance trajectory (tests above). This
    # test pins that work profile so a *regression* (divergence storms,
    # nst runaway) is caught; the mode's actual payoff is the
    # moderately-conditioned Krylov path (heat2d test below).
    ida, _, _ = roberts_single
    assert 250 <= ida.get_num_steps() <= 550
    assert ida.get_num_res_evals() <= 810
    assert ida.get_num_jac_evals() <= 250
    assert ida.get_num_nonlin_solv_conv_fails() <= 60


def _solve_heat2d(
    ls_precision, m=10, touts=(0.01, 0.04, 0.16), krylov_storage="compute"
):
    prob = heat2d_problem(m, use_prec=True)
    u0, up0 = heat2d_ic(m)
    opts = IdaOptions(
        linear_solver="spgmr", mxstep=5000, ls_precision=ls_precision,
        krylov_storage=krylov_storage,
    )
    ida = IDA(prob, u0, up0, tol_ss(1e-5, 1e-8), options=opts)
    out = []
    for t in touts:
        tret, status = ida.solve(t)
        assert status == IdaSolveStatus.Success
        out.append(ida.get_yy().copy())
    return ida, out


def test_heat2d_spgmr_single_vs_full():
    # the f32 Krylov iteration inside the f64 Newton loop reproduces the
    # full-precision trajectory to well inside the 1e-5 rtol
    ida_f, out_f = _solve_heat2d("full")
    ida_s, out_s = _solve_heat2d("single")
    for uf, us in zip(out_f, out_s):
        np.testing.assert_allclose(us, uf, atol=2e-5)
    assert ida_s.get_num_lin_iters() > 0
    assert ida_s.get_num_prec_solves() > 0
    # work profile stays comparable (no convergence-failure storms)
    assert ida_s.get_num_steps() <= 2 * ida_f.get_num_steps()
    assert ida_s.get_num_nonlin_solv_conv_fails() <= 5


def test_heat2d_spgmr_bf16_basis_storage():
    # the bf16-STORED Krylov basis (IdaOptions.krylov_storage="bfloat16",
    # all reductions still f32) keeps GMRES convergent enough that the
    # outer f64 Newton/error-test loop delivers the same trajectory inside
    # the integration tolerance; the work profile may grow (weaker basis
    # orthogonality -> more linear iterations) but must not storm
    ida_f, out_f = _solve_heat2d("full")
    ida_h, out_h = _solve_heat2d("single", krylov_storage="bfloat16")
    for uf, uh in zip(out_f, out_h):
        np.testing.assert_allclose(uh, uf, atol=5e-5)
    assert ida_h.get_num_lin_iters() > 0
    assert ida_h.get_num_steps() <= 2 * ida_f.get_num_steps()
    assert ida_h.get_num_nonlin_solv_conv_fails() <= 10
    # and a compute-dtype storage control on the same mixed path is exact
    # baseline: identical counters to plain ls_precision="single"
    ida_s, out_s = _solve_heat2d("single")
    ida_c, out_c = _solve_heat2d("single", krylov_storage="compute")
    assert ida_c.get_num_steps() == ida_s.get_num_steps()
    assert ida_c.get_num_lin_iters() == ida_s.get_num_lin_iters()
    for us, uc in zip(out_s, out_c):
        np.testing.assert_array_equal(uc, us)


# --- ls_precision="refined": f32-stored LU + one step of f64 defect
# correction against the setup-point Jacobian (VERDICT r4 item 2 lever).
# Measured behaviour (PERF.md round 5): the refinement tracks the "full"
# step sequence exactly through decade 7 (t = 4e3; "single" diverges at
# decade 7 already), but at the stiffest decades kappa(J)*u32 ~ 0.1 caps
# one-step refinement below f64 correction quality and the sequences
# drift — so this is an ACCURACY-PASSING mode like "single", not a
# C-parity mode. The tests pin both facts. ---


@pytest.fixture(scope="module")
def roberts_refined():
    return _run_roberts("refined")


def test_roberts_refined_final_state(roberts_refined):
    # reference check_ans acceptance, identical gate to the other modes
    _, _, outputs = roberts_refined
    reference = np.array(
        [5.2083474251394888e-08, 2.0833390772616859e-13, 9.9999994791631752e-01]
    )
    atol = np.array([1e-8, 1e-6, 1e-6])
    ewt = 1.0 / (1e-4 * np.abs(reference) + 10.0 * atol)
    t_final, y_final = outputs[-1]
    assert t_final == 4.0e10
    err = np.sqrt(np.mean((ewt * (y_final - reference)) ** 2))
    assert err < 1.0


def test_roberts_refined_roots(roberts_refined):
    # both canonical idaRoberts_dns events located despite the f32 factors
    _, roots, _ = roberts_refined
    assert len(roots) == 2
    assert abs(roots[0][0] - 0.264) < 2e-3
    assert abs(roots[1][0] - 2.07e7) / 2.07e7 < 1e-2


def test_refined_tracks_full_mode_early_decades():
    """Through t=4e3 (decade 7, moderate conditioning) one f64 defect-
    correction step restores full-mode step decisions exactly; 'single'
    has already diverged by then — the refinement demonstrably buys
    correction accuracy."""
    def seq(mode):
        prob = roberts_problem(with_roots=False)
        tol = tol_sv(1.0e-4, jnp.array([1e-8, 1e-6, 1e-6]))
        ida = IDA(prob, ROBERTS_YY0, ROBERTS_YP0, tol,
                  options=IdaOptions(ls_precision=mode))
        out = []
        t = 0.4
        for _ in range(7):
            ida.solve(t)
            out.append(int(ida.get_num_steps()))
            t *= 10
        return out

    s_full = seq("full")
    assert seq("refined") == s_full
    assert s_full[:6] == [29, 43, 68, 95, 126, 161]  # canonical prefix


def test_refined_requires_dense():
    with pytest.raises(ValueError):
        IDA(heat2d_problem(8), *heat2d_ic(8), tol_ss(1e-5, 1e-8),
            options=IdaOptions(linear_solver="spgmr", ls_precision="refined"))
