"""Differentiable IDACalcIC (implicit differentiation of the solved IC
system — the IDAS IDASensCalcIC role) and the vmapped batched adjoint.

The IC-solve internals are masked while loops with no VJP; derivatives come
from the implicit function theorem at the solution instead
(sensitivity.make_consistent_ic). Validated here against central finite
differences of the *primal* IC solve, against an exact analytic tangent on
the Roberts YA_YDP system, and end-to-end (calc_ic -> integrate -> loss)
against finite differences of the whole pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu.core.state import IdaOptions
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.sensitivity import (
    adjoint_gradient,
    batched_adjoint_gradient,
    make_consistent_ic,
)
from ida_tpu.tol_control import tol_sv


def _tol():
    return tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))


# inconsistent initial guesses: y3 violates y1+y2+y3=1, y' is wrong
_YY0_BAD = jnp.asarray([1.0, 0.0, 0.3])
_YP0_BAD = jnp.asarray([0.0, 0.0, 0.0])


def test_consistent_ic_ya_ydp_analytic_tangent():
    """From yy0=[1,0,*]: the corrected state is y=[1,0,0], yp=[-k1, k1, 0]
    exactly, so d(ypc)/dk1 = [-1, 1, 0] and d(yyc)/dp = 0 — an exact oracle
    for the implicit-diff JVP."""
    cic = make_consistent_ic(roberts_factory, "ya_ydp", 0.4, _tol())
    p0 = jnp.asarray(ROBERTS_PARAMS)
    (yyc, ypc, ok), (dyy, dyp, _) = jax.jvp(
        lambda p: cic(p, _YY0_BAD, _YP0_BAD),
        (p0,),
        (jnp.asarray([1.0, 0.0, 0.0]),),
    )
    assert float(ok) == 1.0
    np.testing.assert_allclose(np.asarray(yyc), [1.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(dyy), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dyp), [-1.0, 1.0, 0.0], atol=1e-7)


def test_consistent_ic_y_init_grad_vs_fd():
    """Y_INIT (solve for all of y given y'): gradient of a loss of the
    corrected y vs central differences of the primal IC solve."""
    yy0 = jnp.asarray([1.0, 1e-5, 0.05])
    yp0_of = lambda p: jnp.asarray([-0.05, 0.04, 0.0])  # noqa: E731
    cic = make_consistent_ic(roberts_factory, "y", 0.4, _tol())
    w = jnp.asarray([1.0, 1e4, 2.0])  # weight y2's param dependence up

    def loss(p):
        yyc, ypc, ok = cic(p, yy0, yp0_of(p))
        return jnp.sum(yyc * w)

    p0 = jnp.asarray(ROBERTS_PARAMS)
    grad = jax.grad(loss)(p0)
    assert np.all(np.isfinite(np.asarray(grad)))
    for i in range(3):
        v = jnp.zeros(3).at[i].set(1.0)
        eps = 1e-5 * float(p0[i])
        fd = (loss(p0 + eps * v) - loss(p0 - eps * v)) / (2 * eps)
        scale = max(abs(float(fd)), 1e-10)
        assert abs(float(grad[i]) - float(fd)) / scale < 1e-3, (i, grad[i], fd)


def test_adjoint_through_calc_ic_end_to_end():
    """adjoint_gradient(ic=("ya_ydp", ...)) — gradient through BOTH the IC
    solve and the integration, vs central differences of the full primal
    pipeline (same unrolled-Newton configuration)."""
    tol = _tol()
    yy0_of = lambda p: _YY0_BAD  # noqa: E731
    yp0_of = lambda p: _YP0_BAD  # noqa: E731
    loss_of = lambda y: jnp.sum(y * jnp.asarray([1.0, 2.0, 3.0]))  # noqa: E731
    p0 = jnp.asarray(ROBERTS_PARAMS)

    val, grad, istate = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120, ic=("ya_ydp", 0.4),
    )
    assert int(istate) == 0
    assert np.all(np.isfinite(np.asarray(grad)))

    # full-pipeline primal for finite differences
    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.core.state import init_state

    opts = IdaOptions(unroll_newton=True)
    cic = make_consistent_ic(roberts_factory, "ya_ydp", 0.4, tol, opts=opts)

    def primal(p):
        yyc, ypc, ok = cic(p, yy0_of(p), yp0_of(p))
        prob = roberts_factory(p)
        st = init_state(prob, yyc, ypc, opts=opts)
        out = core_solve(
            st, prob, opts, tol, jnp.asarray(4.0, jnp.float64), TASK_NORMAL,
            max_attempts=120,
        )
        return loss_of(out[0].yy)

    for i in range(3):
        v = jnp.zeros(3).at[i].set(1.0)
        eps = 1e-6 * float(p0[i])
        fd = (primal(p0 + eps * v) - primal(p0 - eps * v)) / (2 * eps)
        scale = max(abs(float(fd)), 1e-12)
        assert abs(float(grad[i]) - float(fd)) / scale < 5e-4, (i, grad[i], fd)


def test_batched_adjoint_matches_single():
    """batched_adjoint_gradient = vmap of the single-lane adjoint: per-lane
    values/gradients must match lane-by-lane calls."""
    tol = _tol()
    yy0_of = lambda p: jnp.asarray(ROBERTS_YY0)  # noqa: E731
    yp0_of = lambda p: p[0] * jnp.asarray([-1.0, 1.0, 0.0])  # noqa: E731
    loss_of = lambda y: jnp.sum(y * jnp.asarray([1.0, 2.0, 3.0]))  # noqa: E731

    scales = jnp.asarray([0.98, 1.0, 1.02])[:, None]
    pB = scales * jnp.asarray(ROBERTS_PARAMS)[None, :]

    vals, grads, istates = batched_adjoint_gradient(
        roberts_factory, pB, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    assert np.all(np.asarray(istates) == 0)

    for b in range(3):
        v1, g1, i1 = adjoint_gradient(
            roberts_factory, pB[b], yy0_of, yp0_of, tol, 4.0, loss_of,
            max_attempts=120,
        )
        assert int(i1) == 0
        # vmap changes XLA fusion, not arithmetic: ~1e-12 relative
        np.testing.assert_allclose(float(vals[b]), float(v1), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(grads[b]), np.asarray(g1), rtol=1e-8
        )
