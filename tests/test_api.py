"""One-call convenience API (ida_tpu.solve_dae) — SciPy-idiom wrapper.

Checks the sugar layer delegates exactly to the object API: same grid
rows as IDA.solve_grid, events collected from ROOT_RETURNs, calc_ic
integration for yp0=None, and failure reporting via status codes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ida_tpu
from ida_tpu import IDA, IdaOptions, TolControl, solve_dae
from ida_tpu import constants as C
from ida_tpu.models.roberts import (
    ROBERTS_PARAMS,
    ROBERTS_YY0,
    roberts_factory,
)

P = jnp.asarray(ROBERTS_PARAMS)
Y0 = np.asarray(ROBERTS_YY0)
YP0 = np.asarray([-0.04, 0.04, 0.0])
ATOL = np.asarray([1e-8, 1e-6, 1e-6])


def _res(t, y, yp):
    r1, r2, r3 = P
    return jnp.stack(
        [
            yp[0] + r1 * y[0] - r2 * y[1] * y[2],
            yp[1] - r1 * y[0] + r2 * y[1] * y[2] + r3 * y[1] ** 2,
            y[0] + y[1] + y[2] - 1.0,
        ]
    )


def test_solve_dae_matches_object_api():
    grid = np.asarray([0.4, 4.0, 40.0, 400.0])
    prob = roberts_factory(P)
    # same res/jac/id as the object-API run -> bit-identical step sequence
    sol = solve_dae(
        prob.res, (0.0, 400.0), Y0, YP0, t_eval=grid, rtol=1e-4, atol=ATOL,
        jac=prob.jac, id=np.asarray([True, True, False]),
    )
    assert sol.success, sol.message
    assert np.array_equal(sol.t, grid)
    assert sol.y.shape == (4, 3) and sol.yp.shape == (4, 3)

    ida = IDA(
        prob,
        jnp.asarray(Y0),
        jnp.asarray(YP0),
        TolControl(jnp.asarray(1e-4), jnp.asarray(ATOL)),
    )
    tret, ist, yy, yp = ida.solve_grid(jnp.asarray(grid))
    assert np.array_equal(sol.y, np.asarray(yy))
    assert np.array_equal(sol.yp, np.asarray(yp))
    assert sol.stats["nst"] == int(np.asarray(ida.get_num_steps()))


def test_solve_dae_collects_events():
    def roots(t, y, yp):
        return jnp.stack([y[0] - 1.0e-4, y[2] - 0.01])

    grid = np.asarray([0.4 * 10.0**k for k in range(12)])
    sol = solve_dae(
        _res, (0.0, grid[-1]), Y0, YP0, t_eval=grid, rtol=1e-4, atol=ATOL,
        roots=roots,
    )
    assert sol.success, sol.message
    # canonical idaRoberts_dns events: t ~ 0.264 (g2 up) and ~ 2.08e7 (g1 down)
    assert sol.t_events.shape == (2,)
    assert abs(sol.t_events[0] - 0.264) < 5e-3
    assert 2.0e7 < sol.t_events[1] < 2.2e7
    assert sol.y_events.shape == (2, 3)
    assert sol.stats["nge"] > 0


def test_solve_dae_calc_ic_when_yp0_missing():
    # yp0=None + id mask: consistent derivatives come from IDACalcIC
    sol = solve_dae(
        _res, (0.0, 4.0), Y0, None,
        t_eval=np.asarray([0.4, 4.0]), rtol=1e-4, atol=ATOL,
        id=np.asarray([True, True, False]),
    )
    assert sol.success, sol.message
    # solution matches the explicit-yp0 run to integration accuracy
    ref = solve_dae(_res, (0.0, 4.0), Y0, YP0, t_eval=np.asarray([0.4, 4.0]),
                    rtol=1e-4, atol=ATOL)
    np.testing.assert_allclose(sol.y, ref.y, rtol=1e-3, atol=1e-10)


def test_solve_dae_yp0_missing_without_id_raises():
    with pytest.raises(ValueError, match="yp0=None requires"):
        solve_dae(_res, (0.0, 1.0), Y0, None)


def test_solve_dae_failure_is_reported_not_raised():
    # an inconsistent algebraic constraint makes the first step unsolvable
    def bad_res(t, y, yp):
        return jnp.stack([yp[0] + y[0], y[1] - 1.0, y[1] + 1.0])

    sol = solve_dae(
        bad_res, (0.0, 1.0), np.zeros(3), np.zeros(3),
        t_eval=np.asarray([1.0]),
        options=IdaOptions(mxstep=50),
    )
    assert not sol.success
    assert np.any(sol.status < 0) or len(sol.status) < 1 or not np.all(
        np.isin(sol.status, (C.SUCCESS, C.TSTOP_RETURN, C.ROOT_RETURN))
    )
    assert "failure" in sol.message.lower() or "Solver failure" in sol.message


def test_solve_dae_backward_integration():
    def res(t, y, yp):  # y' = -y as a DAE, integrated backward in time
        return jnp.stack([yp[0] + y[0]])

    sol = solve_dae(
        res, (1.0, 0.2), [np.exp(-1.0)], [-np.exp(-1.0)],
        t_eval=np.asarray([0.8, 0.5, 0.2]), rtol=1e-6, atol=1e-10,
    )
    assert sol.success, sol.message
    np.testing.assert_allclose(sol.y[:, 0], np.exp(-sol.t), rtol=1e-4)


def test_solve_dae_f32_dtype():
    def res32(t, y, yp):  # python-float constants stay weakly typed (f32)
        r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
        r1 = -r0 - 3.0e7 * y[1] * y[1] - yp[1]
        return jnp.stack([r0 - yp[0], r1, y[0] + y[1] + y[2] - 1.0])

    sol = solve_dae(
        res32, (0.0, 4.0), Y0, YP0, t_eval=np.asarray([4.0]),
        rtol=1e-4, atol=ATOL, dtype=jnp.float32,
    )
    assert sol.success, sol.message
    assert sol.y.dtype == np.float32
    assert abs(float(sol.y[0].sum()) - 1.0) < 1e-4
