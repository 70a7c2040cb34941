"""Differential rootfinding: JAX Illinois stack vs the native C++ oracle.

The oracle's IDARcheck1/2/3 + IDARootfind mirror C ida.c (sequential form
of ida_tpu/core/root.py, which cites reference impl_r_check.rs). The two
engines integrate with their own step sequences, so located crossing
times agree to the TRAJECTORY error (~rtol at shallow crossings), not to
the rootfinder's ttol — the bounds here encode that: steep crossings
match to ~1e-12, shallow ones tighten from ~1e-3 to ~1e-6 as rtol drops
1e-4 -> 1e-8, and the iroots sign vectors must match exactly.
"""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu.models import roberts_problem
from ida_tpu.native import oracle_solve_roots
from ida_tpu.tol_control import tol_sv

TOUTS = 0.4 * 10.0 ** np.arange(12)
Y0 = np.array([1.0, 0.0, 0.0])
YP0 = np.array([-0.04, 0.04, 0.0])


def _np_res(t, y, yp):
    r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
    return np.array([r0 - yp[0], -r0 - 3.0e7 * y[1] ** 2 - yp[1],
                     y[0] + y[1] + y[2] - 1.0])


def _np_jac(t, cj, y, yp, r):
    return np.array([
        [-0.04 - cj, 1.0e4 * y[2], 1.0e4 * y[1]],
        [0.04, -1.0e4 * y[2] - 6.0e7 * y[1] - cj, -1.0e4 * y[1]],
        [1.0, 1.0, 1.0],
    ])


def _np_root(t, y, yp):
    return np.array([y[0] - 1.0e-4, y[2] - 0.01])


def _jax_events(rtol, atol, rootdir=None):
    ida = IDA(roberts_problem(with_roots=True), jnp.asarray(Y0),
              jnp.asarray(YP0), tol_sv(rtol, jnp.asarray(atol)))
    if rootdir is not None:
        ida.set_root_direction(rootdir)
    events = []
    t = 0.4
    while t <= 4.0e10:
        tret, status = ida.solve(t)
        if status == IdaSolveStatus.Root:
            events.append((float(tret), np.asarray(ida.get_root_info())))
            continue
        assert status == IdaSolveStatus.Success
        t *= 10
    return events


def test_roberts_roots_match_oracle_loose_tol():
    """rtol=1e-4: both engines find the same two crossings with the same
    iroots signs; the steep first crossing agrees to trajectory-identity
    level, the shallow second to ~rtol-level."""
    atol = np.array([1e-8, 1e-6, 1e-6])
    ret, _y, ev_o, stats = oracle_solve_roots(
        _np_res, _np_jac, _np_root, 2, Y0, YP0, TOUTS, 1e-4, atol)
    assert ret == 0 and stats["nge"] > 0
    ev_j = _jax_events(1e-4, atol)
    assert len(ev_o) == len(ev_j) == 2
    for (to, io), (tj, ij) in zip(ev_o, ev_j):
        assert list(io) == list(ij)
    assert abs(ev_o[0][0] - ev_j[0][0]) / ev_j[0][0] < 1e-12
    assert abs(ev_o[1][0] - ev_j[1][0]) / ev_j[1][0] < 5e-3
    # signs: g1 = y2 - 0.01 crosses INCREASING first, g0 = y0 - 1e-4
    # crosses DECREASING later (C idaRoberts_dns output)
    assert list(ev_j[0][1]) == [0, 1]
    assert list(ev_j[1][1]) == [-1, 0]


def test_roberts_roots_converge_with_tolerance():
    """rtol=1e-8: the engines' trajectories pull together and so do their
    located crossing times (measured 6.4e-8 / 9.8e-10 relative)."""
    atol = np.array([1e-12, 1e-10, 1e-10])
    ret, _y, ev_o, _s = oracle_solve_roots(
        _np_res, _np_jac, _np_root, 2, Y0, YP0, TOUTS, 1e-8, atol)
    assert ret == 0
    ev_j = _jax_events(1e-8, atol)
    assert len(ev_o) == len(ev_j) == 2
    for (to, io), (tj, ij) in zip(ev_o, ev_j):
        assert list(io) == list(ij)
        assert abs(to - tj) / tj < 1e-6


def test_rootdir_filtering_matches_oracle():
    """rootdir = [0, -1] suppresses g1's increasing crossing in BOTH
    engines (IDASetRootDirection semantics): only the decreasing g0
    crossing remains."""
    atol = np.array([1e-8, 1e-6, 1e-6])
    rootdir = np.array([0, -1], np.int32)
    ret, _y, ev_o, _s = oracle_solve_roots(
        _np_res, _np_jac, _np_root, 2, Y0, YP0, TOUTS, 1e-4, atol,
        rootdir=rootdir)
    assert ret == 0
    ev_j = _jax_events(1e-4, atol, rootdir=rootdir)
    assert len(ev_o) == len(ev_j) == 1
    assert list(ev_o[0][1]) == list(ev_j[0][1]) == [-1, 0]
    assert abs(ev_o[0][0] - ev_j[0][0]) / ev_j[0][0] < 5e-3


def test_zero_at_t0_deactivation_matches_oracle():
    """g exactly zero at t0 (the Rcheck1 deactivate/re-activate path):
    g = y1 starts at 0, rises, then decays asymptotically — neither
    engine may report a spurious event."""
    from ida_tpu.problem import IdaProblem

    atol = np.array([1e-8, 1e-6, 1e-6])

    def np_root0(t, y, yp):
        return np.array([y[1]])

    ret, _y, ev_o, stats = oracle_solve_roots(
        _np_res, _np_jac, np_root0, 1, Y0, YP0, TOUTS, 1e-4, atol)
    assert ret == 0 and len(ev_o) == 0

    base = roberts_problem(with_roots=False)
    prob = IdaProblem(n=3, res=base.res, jac=base.jac, nroots=1,
                      root=lambda t, y, yp: jnp.stack([y[1]]))
    ida = IDA(prob, jnp.asarray(Y0), jnp.asarray(YP0),
              tol_sv(1e-4, jnp.asarray(atol)))
    t = 0.4
    while t <= 4.0e10:
        tret, status = ida.solve(t)
        assert status == IdaSolveStatus.Success, (tret, status)
        t *= 10
    assert ida.get_num_g_evals() > 0
