"""Hybrid-system workflow: root event -> discrete update -> reinit -> continue.

The bouncing-ball loop (examples/bounce.py) exercises, in one flow: the
Illinois rootfinder with a direction filter (reference impl_r_check.rs
rootdir semantics), the exact-zero-at-t0 handling after reinit at the event
time (r_check1 gactive deactivation — h(t0) == 0 on every restart), and
IDAReInit semantics (history/counters reset, options/rootdir kept).
Bounce times have a closed form to verify against."""

import numpy as np
import jax.numpy as jnp

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.problem import IdaProblem
from ida_tpu.tol_control import tol_ss

G = 9.81
E = 0.5
H0 = 10.0


def _problem():
    def res(t, y, yp):
        return jnp.stack([yp[0] - y[1], yp[1] + G])

    def root(t, y, yp):
        return y[0:1]

    return IdaProblem(n=2, res=res, root=root, nroots=1)


def test_bouncing_ball_event_times():
    ida = IDA(
        _problem(),
        jnp.asarray([H0, 0.0]),
        jnp.asarray([0.0, -G]),
        tol_ss(1e-10, 1e-12),
    )
    ida.set_root_direction([-1])

    events = []
    while len(events) < 3:
        tret, status = ida.solve(20.0)
        assert status in (IdaSolveStatus.Root, IdaSolveStatus.Success)
        if status == IdaSolveStatus.Root:
            assert ida.get_root_info()[0] == -1
            events.append(float(tret))
            _, v = np.asarray(ida.get_yy())
            v_new = -E * v
            # restitution map; reinit AT the event where g1(t0) == 0 exactly
            ida.reinit(
                jnp.asarray([0.0, v_new]), jnp.asarray([v_new, -G]),
                t0=float(tret),
            )
            # rootdir must survive reinit (IDAReInit keeps it)
            assert int(np.asarray(ida.state.rootdir)[0]) == -1

    t1 = np.sqrt(2.0 * H0 / G)
    ref = [t1, t1 + 2 * E * t1, t1 + 2 * E * t1 + 2 * E**2 * t1]
    np.testing.assert_allclose(events, ref, rtol=0, atol=1e-9)


def test_upward_crossings_filtered():
    # with rootdir = -1 the ball rising through h = h_detect must NOT fire;
    # use a strictly interior threshold so both directions cross it
    def res(t, y, yp):
        return jnp.stack([yp[0] - y[1], yp[1] + G])

    def root(t, y, yp):
        return y[0:1] - 5.0

    prob = IdaProblem(n=2, res=res, root=root, nroots=1)
    # start below the threshold moving up: first crossing is upward
    ida = IDA(prob, jnp.asarray([0.0, 12.0]), jnp.asarray([12.0, -G]),
              tol_ss(1e-10, 1e-12))
    ida.set_root_direction([-1])
    tret, status = ida.solve(3.0)
    assert status == IdaSolveStatus.Root
    # the upward pass through 5.0 was skipped; this is the downward one
    # closed form: 12 t - g t^2 / 2 = 5, larger root
    disc = np.sqrt(12.0**2 - 2 * G * 5.0)
    t_down = (12.0 + disc) / G
    np.testing.assert_allclose(float(tret), t_down, atol=1e-9)
    assert ida.get_root_info()[0] == -1
