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
