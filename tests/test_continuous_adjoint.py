"""Continuous adjoint (sensitivity.continuous_adjoint — the IDAS adjoint
MODULE role: IDAAdjInit / IDASolveB / IDACalcICB / backward quadratures).

Validated three ways: analytically (exponential decay), against the
DISCRETE adjoint (backprop through the solver tape, itself FD-validated)
on the Roberts DAE with a loss on the ALGEBRAIC variable (exercises the
KKT terminal-condition system), and under vmap (batched ensembles of
adjoint solves in one program)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ida_tpu.core.state import IdaOptions
from ida_tpu.models import ROBERTS_PARAMS, ROBERTS_YY0, roberts_factory
from ida_tpu.problem import IdaProblem
from ida_tpu.sensitivity import adjoint_gradient, continuous_adjoint
from ida_tpu.tol_control import tol_ss, tol_sv


def _decay_factory(p):
    def res(t, y, yp):
        return yp + p * y

    return IdaProblem(n=1, res=res)


def test_exponential_decay_analytic():
    p = jnp.asarray(0.7)
    T = 2.0
    loss, gp, gy0, istf, istb = continuous_adjoint(
        _decay_factory, p, jnp.asarray([1.0]), jnp.asarray([-0.7]),
        tol_ss(1e-10, 1e-12), T, lambda y: y[0],
    )
    assert int(istf) == 0 and int(istb) == 0
    ref = np.exp(-0.7 * T)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-8)
    np.testing.assert_allclose(float(gp), -T * ref, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(gy0), [ref], rtol=1e-7)


def test_roberts_algebraic_loss_vs_discrete_adjoint():
    # loss on y3 (the ALGEBRAIC variable): dG/dp must match the discrete
    # adjoint; the terminal lambda(T) comes from the KKT system, lambda_3
    # from the adjoint algebraic constraint
    params = jnp.asarray(ROBERTS_PARAMS)
    yy0 = jnp.asarray(ROBERTS_YY0)
    yp0 = params[0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    T = 4.0
    tol = tol_sv(1e-8, jnp.asarray([1e-10, 1e-12, 1e-10]))
    g = lambda y: y[2]  # noqa: E731
    opts = IdaOptions(mxstep=20000)

    grid = jnp.logspace(-4, np.log10(T), 256)
    loss_c, gp_c, gy0_c, istf, istb = continuous_adjoint(
        roberts_factory, params, yy0, yp0, tol, T, g, grid=grid, opts=opts
    )
    assert int(istf) == 0 and int(istb) == 0

    loss_d, gp_d, ist_d = adjoint_gradient(
        roberts_factory, params, lambda p: yy0,
        lambda p: p[0:1] * jnp.asarray([-1.0, 1.0, 0.0]),
        tol, T, g, max_attempts=900, opts=opts,
    )
    assert int(ist_d) == 0
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-12)
    # measured agreement ~1e-7 relative (tolerance-limited, both methods
    # O(integration error)); assert with margin
    np.testing.assert_allclose(
        np.asarray(gp_c), np.asarray(gp_d), rtol=1e-4
    )


def test_initial_value_gradient_vs_discrete():
    # dG/dy0 from the continuous adjoint (= -M^T lambda(t0)) vs the
    # discrete adjoint with the initial values AS the parameters
    def factory(_):
        def res(t, y, yp):
            # damped oscillator: y1' = y2, y2' = -y1 - 0.3 y2
            return jnp.stack([yp[0] - y[1], yp[1] + y[0] + 0.3 * y[1]])

        return IdaProblem(n=2, res=res)

    T = 3.0
    tol = tol_ss(1e-10, 1e-12)
    g = lambda y: y[0] ** 2 + 0.5 * y[1]  # noqa: E731
    y0 = jnp.asarray([1.0, 0.5])

    def yp0_of(p):
        return jnp.stack([p[1], -p[0] - 0.3 * p[1]])

    loss_c, _, gy0_c, istf, istb = continuous_adjoint(
        factory, jnp.zeros(0), y0, yp0_of(y0), tol, T, g
    )
    assert int(istf) == 0 and int(istb) == 0

    loss_d, gp_d, ist_d = adjoint_gradient(
        factory, y0, lambda p: p, yp0_of, tol, T, g, max_attempts=600
    )
    assert int(ist_d) == 0
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gy0_c), np.asarray(gp_d), rtol=1e-6
    )


def test_vmapped_continuous_adjoint():
    # the whole pipeline (forward dense checkpoints + terminal KKT +
    # backward solve + quadratures) is jnp: one vmapped program computes
    # an ensemble of adjoint gradients
    T = 2.0
    tol = tol_ss(1e-10, 1e-12)

    def one(p):
        loss, gp, gy0, istf, istb = continuous_adjoint(
            _decay_factory, p, jnp.asarray([1.0]), -p[None],
            tol, T, lambda y: y[0],
        )
        return loss, gp, istf + istb

    ps = jnp.asarray([0.3, 0.7, 1.1, 2.0])
    losses, gps, ists = jax.jit(jax.vmap(one))(ps)
    assert np.all(np.asarray(ists) == 0)
    ref = np.exp(-np.asarray(ps) * T)
    np.testing.assert_allclose(np.asarray(losses), ref, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(gps), -T * ref, rtol=1e-6)


def test_rejects_rootfinding():
    def factory(p):
        def res(t, y, yp):
            return yp + p * y

        def root(t, y, yp):
            return y[0:1] - 0.5

        return IdaProblem(n=1, res=res, root=root, nroots=1)

    with pytest.raises(AssertionError):
        continuous_adjoint(
            factory, jnp.asarray(1.0), jnp.asarray([1.0]),
            jnp.asarray([-1.0]), tol_ss(1e-8, 1e-10), 1.0, lambda y: y[0],
        )
