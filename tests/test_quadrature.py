"""Quadrature integration along the solution (core/quad.py) — the IDAS
quadrature role, absent from the reference and from plain C IDA."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaProblem, tol_sv
from ida_tpu.core.quad import get_quad
from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
from ida_tpu.core.state import IdaOptions, init_state
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.sensitivity import adjoint_gradient
from ida_tpu.tol_control import tol_sv as _tol_sv


def _roberts_quad(p, quad, nquad):
    """Roberts with quadrature equations attached."""
    return dataclasses.replace(roberts_factory(p), quad=quad, nquad=nquad)


_TOL = tol_sv(1e-6, jnp.array([1e-10, 1e-8, 1e-8]))
_YY0 = jnp.asarray(ROBERTS_YY0)
_YP0 = jnp.asarray([-0.04, 0.04, 0.0])


def test_conserved_quadrature_is_exact():
    """q = y1+y2+y3 == 1 exactly along the trajectory (the algebraic
    constraint), so ∫ q dt == tret to roundoff — the interpolant
    reproduces constants and Gauss-3 integrates them exactly."""
    prob = _roberts_quad(
        jnp.asarray(ROBERTS_PARAMS),
        lambda t, yy, yp: jnp.stack([yy[0] + yy[1] + yy[2]]),
        1,
    )
    ida = IDA(prob, _YY0, _YP0, _TOL)
    for tout in [0.4, 4.0, 40.0]:
        tret, _ = ida.solve(tout)
        q = ida.get_quad()
        assert abs(float(q[0]) - float(tret)) < 1e-9 * max(1.0, tout), (
            tout, q, tret
        )
    # the raw accumulator runs to the INTERNAL time tn >= tret
    assert float(ida.state.yQ[0]) >= float(tret) - 1e-9


def test_quadrature_matches_augmented_system():
    """∫ y1 dt and ∫ y3 dt vs the same integrals computed by augmenting the
    DAE with two extra differential variables w' = y1, w' = y3 — two
    different discretizations of the same integral must agree to solver
    accuracy."""
    p = jnp.asarray(ROBERTS_PARAMS)
    prob_q = _roberts_quad(
        p, lambda t, yy, yp: jnp.stack([yy[0], yy[2]]), 2
    )
    ida = IDA(prob_q, _YY0, _YP0, _TOL)
    tret, _ = ida.solve(400.0)
    q = ida.get_quad()

    def res_aug(t, yy, yp):
        r = roberts_factory(p).res(t, yy[:3], yp[:3])
        return jnp.concatenate([r, jnp.stack([yp[3] - yy[0], yp[4] - yy[2]])])

    prob_aug = IdaProblem(
        n=5, res=res_aug,
        id=jnp.asarray([True, True, False, True, True]),
    )
    tol_aug = _tol_sv(
        1e-6, jnp.array([1e-10, 1e-8, 1e-8, 1e-8, 1e-8])
    )
    ida2 = IDA(
        prob_aug,
        jnp.concatenate([_YY0, jnp.zeros(2)]),
        jnp.concatenate([_YP0, jnp.asarray([1.0, 0.0])]),
        tol_aug,
    )
    ida2.solve(400.0)
    w = np.asarray(ida2.get_yy())[3:]
    for i in range(2):
        rel = abs(float(q[i]) - w[i]) / max(abs(w[i]), 1e-12)
        assert rel < 1e-5, (i, q[i], w[i], rel)


def test_quadrature_batched():
    """Quadratures ride the vmapped ensemble unchanged."""
    from ida_tpu.parallel import ensemble_init

    params = jnp.stack([jnp.asarray(ROBERTS_PARAMS)] * 4)
    params = params * jnp.asarray([1.0, 1.1, 0.9, 1.05])[:, None]
    factory = lambda p: _roberts_quad(  # noqa: E731
        p, lambda t, yy, yp: jnp.stack([yy[0] + yy[1] + yy[2]]), 1
    )
    yy0 = jnp.broadcast_to(_YY0, (4, 3))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    states = ensemble_init(factory, params, yy0, yp0)
    opts = IdaOptions()
    tol = tol_sv(
        jnp.full((4,), 1e-6), jnp.broadcast_to(jnp.array([1e-10, 1e-8, 1e-8]), (4, 3))
    )

    def one(st, p, rtol, atol):
        prob = factory(p)
        t = jnp.asarray(4.0, jnp.float64)
        st2, tret, istate = core_solve(
            st, prob, opts, _tol_sv(rtol, atol), t, TASK_NORMAL
        )
        return get_quad(st2, prob, tret)[0], tret, istate

    q, tret, istate = jax.vmap(one)(states, params, tol.rtol, tol.atol)
    assert np.all(np.asarray(istate) == 0)
    np.testing.assert_allclose(np.asarray(q), np.asarray(tret), rtol=1e-9)


def test_adjoint_of_quadrature_loss():
    """d/dp ∫_0^T y3(t; p) dt via the discrete adjoint vs central
    differences — the classic IDAS adjoint-with-quadrature use case."""
    p0 = jnp.asarray(ROBERTS_PARAMS)
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    factory = lambda p: _roberts_quad(  # noqa: E731
        p, lambda t, yy, yp: jnp.stack([yy[2]]), 1
    )
    yy0_of = lambda p: _YY0  # noqa: E731
    yp0_of = lambda p: p[0] * jnp.asarray([-1.0, 1.0, 0.0])  # noqa: E731
    loss_of_state = lambda st, tret, prob: get_quad(st, prob, tret)[0]  # noqa: E731

    val, grad, istate = adjoint_gradient(
        factory, p0, yy0_of, yp0_of, tol, 4.0, None,
        max_attempts=120, loss_of_state=loss_of_state,
    )
    assert int(istate) == 0
    assert np.all(np.isfinite(np.asarray(grad)))

    opts = IdaOptions(unroll_newton=True)

    def loss(p):
        prob = factory(p)
        st = init_state(prob, yy0_of(p), yp0_of(p), dtype=jnp.float64,
                        opts=opts)
        out = core_solve(st, prob, opts, tol, jnp.asarray(4.0, jnp.float64),
                         TASK_NORMAL, max_attempts=120)
        return float(get_quad(out[0], prob, out[1])[0])

    for i in range(2):  # k1, k2 (k3's effect is below fd resolution)
        v = jnp.zeros(3).at[i].set(1.0)
        eps = 1e-6 * float(p0[i])
        fd = (loss(p0 + eps * v) - loss(p0 - eps * v)) / (2 * eps)
        scale = max(abs(fd), 1e-12)
        assert abs(float(grad[i]) - fd) / scale < 1e-3, (i, grad[i], fd)


def test_get_quad_rejects_out_of_window_t():
    """Like get_solution/get_dky (and IDAS's IDAGetQuad), get_quad(t) must
    reject a t outside the last step instead of silently extrapolating the
    BDF interpolant."""
    import pytest
    from ida_tpu.solver import IdaError

    prob = _roberts_quad(
        jnp.asarray(ROBERTS_PARAMS),
        lambda t, yy, yp: jnp.stack([yy[0] + yy[1] + yy[2]]),
        1,
    )
    ida = IDA(prob, _YY0, _YP0, _TOL)
    ida.solve(400.0)
    with pytest.raises(IdaError):
        ida.get_quad(t=10.0)  # far outside [tn - hused, tn]
