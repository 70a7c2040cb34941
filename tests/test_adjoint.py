"""Discrete-adjoint (reverse-mode) gradients by jax.grad back through the
adaptive solver — the IDAS adjoint (IDAA) role, absent from the reference
and from C IDA. Exercises the safe_ad() trace guards (utils/ad_mode.py):
without them every gradient is NaN-poisoned by masked-lane 0*inf."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
from ida_tpu.core.state import IdaOptions, init_state
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.sensitivity import adjoint_gradient, solve_with_params
from ida_tpu.tol_control import tol_sv
from ida_tpu.utils.ad_mode import is_safe_ad, safe_ad


def _setup():
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    yy0_of = lambda p: jnp.asarray(ROBERTS_YY0)  # noqa: E731
    yp0_of = lambda p: p[0] * jnp.asarray([-1.0, 1.0, 0.0])  # noqa: E731
    return tol, yy0_of, yp0_of


_W = jnp.asarray([1.0, 2.0, 3.0])


def test_adjoint_matches_finite_differences():
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    loss_of = lambda y: jnp.sum(y * _W)  # noqa: E731

    val, grad, istate = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    assert int(istate) == 0
    assert np.all(np.isfinite(np.asarray(grad)))

    # central differences on the same (unrolled-Newton) configuration
    opts = IdaOptions(unroll_newton=True)
    f = solve_with_params(roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, opts)
    for i in range(3):
        v = jnp.zeros(3).at[i].set(1.0)
        eps = 1e-6 * float(p0[i])
        fd = (loss_of(f(p0 + eps * v)) - loss_of(f(p0 - eps * v))) / (2 * eps)
        scale = max(abs(float(fd)), 1e-12)
        assert abs(float(grad[i]) - float(fd)) / scale < 5e-4, (i, grad[i], fd)


def test_adjoint_conserved_loss_has_zero_gradient():
    """sum(y) is conserved exactly by the Roberts DAE (third equation is the
    algebraic constraint y1+y2+y3=1), so its gradient wrt the rate constants
    must vanish to solver accuracy — a stringent adjoint consistency check."""
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    val, grad, istate = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0,
        lambda y: jnp.sum(y), max_attempts=120,
    )
    assert int(istate) == 0
    assert abs(float(val) - 1.0) < 1e-10
    # k1 ~ O(1): gradient component must be ~0 (fd confirms ~1e-14)
    assert abs(float(grad[0])) < 1e-8


def test_remat_adjoint_matches_plain():
    """IdaOptions(remat_attempts=True) trades backward memory for
    recompute; the recomputed arithmetic is identical, so gradients must
    match the non-remat adjoint exactly."""
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    loss_of = lambda y: jnp.sum(y * _W)  # noqa: E731

    val0, g0, i0 = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    valr, gr, ir = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120, opts=IdaOptions(remat_attempts=True),
    )
    assert int(i0) == 0 and int(ir) == 0
    assert float(val0) == float(valr)
    # same arithmetic, but the remat backward is a different XLA program —
    # FMA fusion differences show up at ~1e-14 relative (see conftest note
    # on fusion-level reproducibility)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(gr), rtol=1e-12)


def test_adjoint_of_event_time():
    """Gradient of a ROOT-RETURN event time: one backward pass yields
    d(t_root)/dp for ALL parameters (the adjoint counterpart of
    test_sensitivity.test_jvp_through_root_return, which needs one jvp per
    parameter). The Illinois iterations and the interpolation to tlo are
    all traced, so the event time is differentiable."""
    from functools import partial
    from ida_tpu import constants as C
    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL

    tol, yy0_of, yp0_of = _setup()
    factory = partial(roberts_factory, with_roots=True)
    p0 = jnp.asarray(ROBERTS_PARAMS)

    val, grad, istate = adjoint_gradient(
        factory, p0, yy0_of, yp0_of, tol, 4.0, None, max_attempts=120,
        loss_of_state=lambda st, tret, prob: tret,
    )
    assert int(istate) == C.ROOT_RETURN
    # faster decay (larger k1) => earlier crossing
    assert float(grad[0]) < 0.0

    # central differences of the SAME (unrolled-Newton, budgeted) primal
    opts = IdaOptions(unroll_newton=True)

    def troot(p):
        prob = factory(p)
        st = init_state(prob, yy0_of(p), yp0_of(p), opts=opts)
        out = core_solve(st, prob, opts, tol, jnp.asarray(4.0), TASK_NORMAL,
                         max_attempts=120)
        return float(out[1])

    for i in range(3):
        v = jnp.zeros(3).at[i].set(1.0)
        eps = 1e-6 * float(p0[i])
        fd = (troot(p0 + eps * v) - troot(p0 - eps * v)) / (2 * eps)
        scale = max(abs(fd), 1e-12)
        assert abs(float(grad[i]) - fd) / scale < 1e-3, (i, grad[i], fd)


def test_safe_ad_guards_are_identity_outside_context():
    """Outside safe_ad() the guard helpers must be exact identities so the
    C-parity compute path is untouched."""
    from ida_tpu.utils.ad_mode import smask_den, smask_pos, spow, ssqrt

    assert not is_safe_ad()
    x = jnp.asarray([0.0, -1.0, 2.0])
    assert smask_den(x) is x
    assert smask_pos(x) is x
    np.testing.assert_array_equal(np.asarray(spow(jnp.abs(x), 0.5)),
                                  np.asarray(jnp.abs(x) ** 0.5))
    np.testing.assert_array_equal(np.asarray(ssqrt(jnp.abs(x))),
                                  np.asarray(jnp.sqrt(jnp.abs(x))))
    with safe_ad():
        assert is_safe_ad()
        np.testing.assert_array_equal(np.asarray(smask_den(x)),
                                      np.asarray([1.0, -1.0, 2.0]))
    assert not is_safe_ad()


def test_safe_ad_primal_is_bit_identical():
    """The guarded trace must produce the SAME primal trajectory and step
    statistics as the normal trace: every guard substitutes only into
    select-discarded values."""
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    opts = IdaOptions(unroll_newton=True)

    def run():
        prob = roberts_factory(p0)
        st = init_state(prob, yy0_of(p0), yp0_of(p0), dtype=jnp.float64,
                        opts=opts)
        out = core_solve(st, prob, opts, tol,
                         jnp.asarray(4.0e4, jnp.float64), TASK_NORMAL,
                         max_attempts=200)
        return out[0]

    ref = run()
    with safe_ad():
        guarded = run()
    np.testing.assert_array_equal(np.asarray(ref.yy), np.asarray(guarded.yy))
    assert int(ref.nst) == int(guarded.nst)
    assert int(ref.nni) == int(guarded.nni)
    assert int(ref.netf) == int(guarded.netf)
    assert int(ref.nje) == int(guarded.nje)


def test_adjoint_auto_routes_and_agrees():
    """adjoint_gradient_auto: the two routes must agree on the same
    qualifying problem, and forced routing must behave (crossover=0 =>
    continuous; huge crossover => discrete). Root problems always take the
    discrete route regardless of crossover."""
    from ida_tpu.sensitivity import adjoint_gradient_auto

    tol, _, _ = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    yy0 = jnp.asarray(ROBERTS_YY0)
    yp0 = p0[0] * jnp.asarray([-1.0, 1.0, 0.0])
    loss_of = lambda y: jnp.sum(y * _W)  # noqa: E731

    # forced continuous vs forced discrete on the same horizon
    lc, gc, ic_ = adjoint_gradient_auto(
        roberts_factory, p0, yy0, yp0, tol, 4.0, loss_of,
        max_attempts=120, crossover=0,
    )
    ld, gd, id_ = adjoint_gradient_auto(
        roberts_factory, p0, yy0, yp0, tol, 4.0, loss_of,
        max_attempts=120, crossover=10**9,
    )
    assert int(ic_) == 0 and int(id_) == 0
    # the continuous route reads y(tout) off the dense-output grid, the
    # discrete route from the direct solve: both are rtol=1e-4 integrations
    np.testing.assert_allclose(float(lc), float(ld), rtol=5e-4)
    # strategies differ (checkpoint interpolation vs exact tape): a few
    # significant digits of agreement is the expected envelope
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), rtol=2e-2)

    # default routing at this horizon picks continuous: identical to the
    # forced-continuous result
    la, ga, ia = adjoint_gradient_auto(
        roberts_factory, p0, yy0, yp0, tol, 4.0, loss_of, max_attempts=120,
    )
    assert int(ia) == 0
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gc), rtol=1e-12)

    # rootfinding problems must fall back to the discrete tape even when
    # the crossover would prefer continuous (continuous_adjoint asserts
    # nroots == 0, so taking that route would raise). tout pre-dates the
    # first Roberts root (t ~ 0.264) so the solve itself succeeds.
    import functools

    rooted = functools.partial(roberts_factory, with_roots=True)
    lr, gr, ir = adjoint_gradient_auto(
        rooted, p0, yy0, yp0, tol, 0.2, loss_of, max_attempts=120,
        crossover=0,
    )
    ld3, gd3, id3 = adjoint_gradient(
        rooted, p0, lambda p: yy0, lambda p: yp0, tol, 0.2, loss_of,
        max_attempts=120,
    )
    assert int(ir) == 0 and int(id3) == 0
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gd3), rtol=1e-12)

    # multi-decade horizons route to the DISCRETE tape (checkpoint
    # interpolation accuracy collapses there — docs/user_guide.md §10a):
    # max_attempts above the continuous window must reproduce the
    # explicit discrete call exactly
    ll, gl, il = adjoint_gradient_auto(
        roberts_factory, p0, yy0, yp0, tol, 4.0, loss_of, max_attempts=200,
    )
    ld2, gd2, id2 = adjoint_gradient(
        roberts_factory, p0, lambda p: yy0, lambda p: yp0, tol, 4.0,
        loss_of, max_attempts=200,
    )
    assert int(il) == 0
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gd2), rtol=1e-12)
