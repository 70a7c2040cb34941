"""Events inside the fused dense-output path (VERDICT r3 item 5).

``solve_dense`` is the fast grid-sweep form; these tests assert that with
``max_events`` it records the SAME root crossings the scan form returns one
ROOT_RETURN at a time (reference impl_solve.rs:186-227/:335-359,
impl_r_check.rs:343-576), that the events leave the recorded trajectory
rows untouched, and that the per-lane buffers work at ensemble width
(bounce-ball closed form at B=4096, the VERDICT acceptance case).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu import constants as C
from ida_tpu.parallel import EnsembleIDA
from ida_tpu.problem import IdaProblem
from ida_tpu.tol_control import tol_ss

G = 9.81
H0 = 10.0


def _oscillator(with_roots=True):
    """y0'' = -y0 as a DAE: y0 = cos t from (1, 0); y0 crosses zero at
    t = pi/2 + k*pi with alternating directions."""

    def res(t, y, yp):
        return jnp.stack([yp[0] - y[1], yp[1] + y[0]])

    if not with_roots:
        return IdaProblem(n=2, res=res)
    return IdaProblem(n=2, res=res, root=lambda t, y, yp: y[0:1], nroots=1)


def _bounce():
    def res(t, y, yp):
        return jnp.stack([yp[0] - y[1], yp[1] + G])

    return IdaProblem(n=2, res=res, root=lambda t, y, yp: y[0:1], nroots=1)


TOL = (1e-10, 1e-12)
GRID = np.linspace(1.0, 10.0, 7)
CROSSINGS = [np.pi / 2, 3 * np.pi / 2, 5 * np.pi / 2]


def _dense_osc(max_events=8):
    ida = IDA(_oscillator(), jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, -1.0]),
              tol_ss(*TOL))
    return ida.solve_grid(GRID, max_events=max_events)


def test_dense_events_match_closed_form_and_scan():
    tret, ist, yy, yp, ev = _dense_osc()
    assert (ist == C.SUCCESS).all()
    n = int(ev.count)
    assert n == 3
    np.testing.assert_allclose(ev.t[:3], CROSSINGS, rtol=0, atol=1e-8)
    # C sign convention: cos falls through zero at pi/2 (-1), rises at
    # 3pi/2 (+1), falls again at 5pi/2
    assert list(ev.iroots[:3, 0]) == [-1, 1, -1]
    # y0 ~ 0 and |y1| ~ 1 at each crossing
    np.testing.assert_allclose(ev.yy[:3, 0], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.abs(ev.yy[:3, 1]), 1.0, atol=1e-7)

    # authoritative parity: the scan form's ROOT_RETURN times over the SAME
    # grid (same first-call h0 heuristic => same stepping sequence). The
    # bracket hi differs by the per-leg toutc clamp (impl_r_check.rs:228),
    # so agreement is to the rootfinder's ttol (~100 eps), not bitwise.
    ida = IDA(_oscillator(), jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, -1.0]),
              tol_ss(*TOL))
    scan_events = []
    for t in GRID:
        while True:
            tr, status = ida.solve(float(t))
            if status == IdaSolveStatus.Root:
                scan_events.append(float(tr))
                continue
            assert status == IdaSolveStatus.Success
            break
    np.testing.assert_allclose(
        np.asarray(ev.t[:3]), scan_events, rtol=0, atol=1e-11
    )


def test_dense_events_do_not_perturb_rows():
    """Root checks interpolate from phi; they must not change the stepping
    sequence, so the recorded rows are BIT-identical to a rootless run."""
    tret, ist, yy, yp, ev = _dense_osc()
    ida0 = IDA(_oscillator(with_roots=False), jnp.asarray([1.0, 0.0]),
               jnp.asarray([0.0, -1.0]), tol_ss(*TOL))
    tret0, ist0, yy0, yp0 = ida0.solve_grid(GRID)
    np.testing.assert_array_equal(yy, yy0)
    np.testing.assert_array_equal(yp, yp0)
    np.testing.assert_array_equal(ist, ist0)


def test_dense_events_buffer_overflow_counts():
    """max_events=2 with 3 crossings: first two kept, count exposes 3."""
    tret, ist, yy, yp, ev = _dense_osc(max_events=2)
    assert int(ev.count) == 3
    np.testing.assert_allclose(ev.t, CROSSINGS[:2], rtol=0, atol=1e-8)
    assert (ist == C.SUCCESS).all()


def test_dense_events_rootdir_filter():
    """rootdir = [-1]: only downward crossings are events (reference
    impl_r_check.rs rootdir semantics ride through the dense path)."""
    ida = IDA(_oscillator(), jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, -1.0]),
              tol_ss(*TOL))
    ida.set_root_direction([-1])
    tret, ist, yy, yp, ev = ida.solve_grid(GRID, max_events=8)
    assert int(ev.count) == 2
    np.testing.assert_allclose(
        ev.t[:2], [CROSSINGS[0], CROSSINGS[2]], rtol=0, atol=1e-8
    )


def test_dense_events_roberts_12_decades():
    """The canonical Roberts roots (idaRoberts_dns: y0 = 1e-4 near t=0.264,
    y2 = 0.01 near t=2.08e7) through the dense sweep, vs the scan form."""
    from ida_tpu.models import roberts_problem
    from ida_tpu.tol_control import tol_sv

    tol = tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))
    y0 = jnp.asarray([1.0, 0.0, 0.0])
    yp0 = jnp.asarray([-0.04, 0.04, 0.0])
    grid = 0.4 * 10.0 ** np.arange(12)

    ida = IDA(roberts_problem(with_roots=True), y0, yp0, tol)
    tret, ist, yy, yp, ev = ida.solve_grid(grid, max_events=4)
    assert (ist == C.SUCCESS).all()
    assert int(ev.count) == 2

    ida_s = IDA(roberts_problem(with_roots=True), y0, yp0, tol)
    scan_events = []
    for t in grid:
        while True:
            tr, status = ida_s.solve(float(t))
            if status == IdaSolveStatus.Root:
                scan_events.append(float(tr))
                continue
            assert status == IdaSolveStatus.Success
            break
    assert len(scan_events) == 2
    np.testing.assert_allclose(np.asarray(ev.t[:2]), scan_events, rtol=1e-12)
    # the known reference values (idaRoberts_dns output)
    np.testing.assert_allclose(
        np.asarray(ev.t[:2]), [0.2640160, 2.0786e7], rtol=1e-3
    )


def test_dense_events_bounce_batched_4096():
    """VERDICT r3 item 5 acceptance: bounce-ball event times at B=4096
    match the single-instance path (per-lane drop heights => per-lane
    closed-form impact times sqrt(2 h0 / g))."""
    B = 4096
    h0 = np.linspace(1.0, 25.0, B)
    yy0 = np.stack([h0, np.zeros(B)], axis=1)
    yp0 = np.stack([np.zeros(B), np.full(B, -G)], axis=1)

    ens = EnsembleIDA(
        lambda p: _bounce(), jnp.zeros(B), yy0, yp0, tol_ss(1e-10, 1e-12)
    )
    grid = np.asarray([3.0])  # past every lane's impact... except none: the
    # ball keeps falling after the crossing, so one event per lane
    tret, ist, yy, yp, ev = ens.solve_grid(grid, max_events=2)
    assert (ist == C.SUCCESS).all()
    counts = np.asarray(ev.count)
    assert (counts == 1).all()
    t_impact = np.sqrt(2.0 * h0 / G)
    np.testing.assert_allclose(np.asarray(ev.t)[:, 0], t_impact, atol=1e-8)
    assert (np.asarray(ev.iroots)[:, 0, 0] == -1).all()

    # one lane vs the single-instance dense path: identical event time
    k = 1234
    ida = IDA(_bounce(), jnp.asarray(yy0[k]), jnp.asarray(yp0[k]),
              tol_ss(1e-10, 1e-12))
    *_rows, ev1 = ida.solve_grid(grid, max_events=2)
    np.testing.assert_array_equal(np.asarray(ev.t)[k], np.asarray(ev1.t))
