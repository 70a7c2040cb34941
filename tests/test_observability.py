"""Observability: data-trace debug mode, get_dky, OneStep mode, Lorenz63
stop-test paths, slider-crank integration."""

import json

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaOptions, IdaSolveStatus, IdaTask
from ida_tpu.models import (
    lorenz63_problem,
    roberts_problem,
    slider_crank_problem,
    ROBERTS_YY0,
    ROBERTS_YP0,
)
from ida_tpu.tol_control import tol_ss, tol_sv
from ida_tpu.utils.trace import DataTrace


def test_data_trace(tmp_path):
    # reference data_trace feature: one record per step attempt with the
    # full coefficient state (src/lib.rs:635-639)
    path = tmp_path / "trace.jsonl"
    ida = IDA(
        roberts_problem(with_roots=False),
        ROBERTS_YY0,
        ROBERTS_YP0,
        tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6])),
        options=IdaOptions(debug_trace=True),
    )
    with DataTrace(str(path)) as tr:
        ida.solve(0.4)
    assert len(tr.records) >= ida.get_num_steps()  # attempts >= steps
    rec = tr.records[0]
    for f in ("tn", "hh", "kk", "cj", "psi", "phi", "nst"):
        assert f in rec
    # file round-trips as JSONL
    lines = path.read_text().strip().splitlines()
    assert len(lines) == len(tr.records)
    first = json.loads(lines[0])
    assert len(first["phi"]) == 6 and len(first["phi"][0]) == 3
    # the trace shows h growing through the startup phase
    hs = [r["hh"] for r in tr.records[:5]]
    assert hs[1] >= hs[0]


def test_trace_off_by_default(tmp_path):
    ida = IDA(
        roberts_problem(with_roots=False),
        ROBERTS_YY0,
        ROBERTS_YP0,
        tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6])),
    )
    with DataTrace() as tr:
        ida.solve(0.4)
    assert tr.records == []  # debug_trace not set -> no callbacks emitted


def test_lorenz63():
    # the reference's lorenz63 integration test is an empty stub with no
    # #[test] (reference tests/lorenz63.rs, SURVEY.md §2.4); this is the
    # real thing: integrate the implicit-form Lorenz system and check
    # against a reference RK integration (scipy-free: fine RK4 here)
    prob = lorenz63_problem()
    y0 = np.array([1.0, 1.0, 1.0])

    def f(y):
        return np.array(
            [10.0 * (y[1] - y[0]), y[0] * (28.0 - y[2]) - y[1], y[0] * y[1] - 8.0 / 3.0 * y[2]]
        )

    ida = IDA(prob, y0, f(y0), tol_ss(1e-8, 1e-10), options=IdaOptions(mxstep=50000))
    t_end = 2.0
    tret, status = ida.solve(t_end)
    assert status == IdaSolveStatus.Success

    # RK4 reference at fine step
    y = y0.copy()
    h = 2e-5
    for _ in range(int(t_end / h)):
        k1 = f(y); k2 = f(y + 0.5 * h * k1); k3 = f(y + 0.5 * h * k2); k4 = f(y + h * k3)
        y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    np.testing.assert_allclose(ida.get_yy(), y, rtol=2e-4)


def test_lorenz63_tstop_and_onestep():
    prob = lorenz63_problem()
    y0 = np.array([1.0, 1.0, 1.0])
    yp0 = np.array([0.0, 26.0, 1.0 - 8.0 / 3.0])
    ida = IDA(prob, y0, yp0, tol_ss(1e-6, 1e-8), options=IdaOptions(mxstep=20000))
    ida.set_stop_time(0.5)
    # OneStep mode honours tstop exactly
    status = None
    for _ in range(100000):
        tret, status = ida.solve(10.0, itask=IdaTask.OneStep)
        if status == IdaSolveStatus.TStop:
            break
    assert status == IdaSolveStatus.TStop
    assert tret == 0.5


def test_slider_crank():
    # index-2 GGL DAE from the reference (src/sample_problems/slider_crank.rs
    # — shipped there residual-only, never integrated). AD Jacobian;
    # suppressalg excludes the algebraic multipliers from the error test
    # (required for index-2, as in C IDA usage).
    from ida_tpu.models.slider_crank import slider_crank_ic

    a = 0.5
    prob = slider_crank_problem()
    yy0, yp0 = slider_crank_ic(a)
    ida = IDA(
        prob, yy0, yp0, tol_ss(1e-6, 1e-6),
        options=IdaOptions(mxstep=50000, suppressalg=True),
    )
    tret, status = ida.solve(0.1)
    assert status == IdaSolveStatus.Success
    y = ida.get_yy()
    # position constraints still satisfied (GGL stabilization)
    np.testing.assert_allclose(y[1], np.cos(y[2]) + a * np.cos(y[0]), atol=1e-8)
    np.testing.assert_allclose(-np.sin(y[2]) - a * np.sin(y[0]), 0.0, atol=1e-8)
    # it actually moved
    assert abs(y[0] - yy0[0]) > 1e-4


def test_get_dky_matches_interp_derivative():
    ida = IDA(
        roberts_problem(with_roots=False),
        ROBERTS_YY0,
        ROBERTS_YP0,
        tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6])),
    )
    ida.solve(4.0)
    # dky is only legal inside the last internal step [tn - hused, tn]
    tn = ida.get_current_time()
    h = ida.get_last_step()
    t = tn - 0.5 * h
    yy, yp = ida.get_solution(t)
    np.testing.assert_allclose(ida.get_dky(t, 0), yy, rtol=1e-12)
    np.testing.assert_allclose(ida.get_dky(t, 1), yp, rtol=1e-12)
    # finite-difference check of the 2nd derivative against dky(1)
    eps = 1e-6 * h
    d1a = ida.get_dky(t - eps, 1)
    d1b = ida.get_dky(t + eps, 1)
    d2 = ida.get_dky(t, 2)
    np.testing.assert_allclose((d1b - d1a) / (2 * eps), d2, rtol=1e-4, atol=1e-20)


def test_solve_grid_dense_output():
    """solve_grid sweeps a time grid in one scan; outputs match repeated
    solve() calls exactly."""
    import numpy as np
    from ida_tpu import IDA
    from ida_tpu.models import roberts_problem, ROBERTS_YY0
    from ida_tpu.tol_control import tol_sv

    prob = roberts_problem()
    yy0 = jnp.asarray(ROBERTS_YY0, jnp.float64)
    yp0 = jnp.asarray([-0.04, 0.04, 0.0], jnp.float64)
    tol = tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))
    grid = jnp.asarray([0.4, 4.0, 40.0, 400.0])

    ida = IDA(prob, yy0, yp0, tol)
    tret, ist, yy, yp = ida.solve_grid(grid)
    assert yy.shape == (4, 3) and yp.shape == (4, 3)
    assert np.all(ist == 0)
    assert np.allclose(tret, np.asarray(grid))

    from ida_tpu.solver import IdaSolveStatus

    ida2 = IDA(prob, yy0, yp0, tol)
    for i, t in enumerate(np.asarray(grid)):
        while ida2.solve(float(t))[1] == IdaSolveStatus.Root:
            pass  # solve_grid passes through root crossings
        assert np.array_equal(np.asarray(ida2.state.yy), yy[i])


def test_ensemble_solve_grid():
    import numpy as np
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
    from ida_tpu.parallel import EnsembleIDA
    from ida_tpu.tol_control import tol_sv

    B = 3
    params = jnp.asarray(np.outer(np.linspace(0.9, 1.1, B), ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    tol = tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    grid = jnp.asarray([0.4, 4.0, 40.0])
    tret, ist, yy, yp = ens.solve_grid(grid)
    assert yy.shape == (3, B, 3)
    assert np.all(ist == 0)
    # per-lane grids: lane i stops at grid * (1 + i/10)
    ens2 = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    pl_grid = jnp.asarray(np.outer([0.4, 4.0], 1.0 + np.arange(B) / 10.0))
    tret2, ist2, yy2, yp2 = ens2.solve_grid(pl_grid)
    assert np.all(ist2 == 0)
    assert np.allclose(tret2, np.asarray(pl_grid))
