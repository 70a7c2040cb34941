"""Forward AND adjoint (reverse-mode) sensitivity analysis via AD through
the solver.

The C SUNDIALS family needs a separate package (IDAS) with dedicated
forward-sensitivity and adjoint (backward) equations to compute dy/dp and
dL/dp; the reference implements none of it (SURVEY.md §2.3 lists
quadrature/FSA/adjoint as absent). Here the whole integrator is a pure
traced function, so:

- one ``jax.jvp`` through ``core.solve`` yields FORWARD parameter
  sensitivities of the numerical solution (``forward_sensitivity``) —
  validated against central finite differences to ~1e-7 relative on
  Roberts (tests/test_sensitivity.py);
- one ``jax.grad`` back through every step attempt yields the DISCRETE
  ADJOINT gradient of a scalar loss of the solution
  (``adjoint_gradient``) — the IDAS "IDAA" role, with exact consistency
  to the forward numerics by construction (the discrete adjoint of the
  actual BDF steps taken, not a separately integrated adjoint DAE).
  Validated against central differences (tests/test_adjoint.py).

Reverse mode needs two ingredients forward mode does not:

1. A reverse-differentiable loop form: ``lax.while_loop`` has no VJP, so
   the adjoint path runs the budgeted ``max_attempts`` fori/scan form of
   the attempt loop and the unrolled Newton loop
   (``IdaOptions(unroll_newton=True)``).
2. The ``safe_ad()`` trace context (utils/ad_mode.py): the solver's
   self-masked lanes legitimately compute discarded inf/nan garbage whose
   *backward* 0·inf products would poison real gradients; under
   ``safe_ad()`` every such site is guarded primal-preservingly.

Caveat (inherent to differentiating adaptive solvers, not to this
implementation): the derivative is of the NUMERICAL solution including its
step-size/order control, which is piecewise-smooth in the parameters; for
very tight accuracy on dy/dp, tighten rtol/atol as you would for y itself.
Memory: reverse mode stores the loop carry per attempt
(O(max_attempts · state size)); size ``max_attempts`` to the problem.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .core.solve import solve as core_solve, TASK_NORMAL
from .core.state import IdaOptions, init_state
from .problem import IdaProblem
from .tol_control import TolControl
from .utils.ad_mode import safe_ad


def solve_with_params(
    problem_factory: Callable[[Any], IdaProblem],
    params: Any,
    yy0_of: Callable[[Any], jax.Array],
    yp0_of: Callable[[Any], jax.Array],
    tol: TolControl,
    tout,
    opts: IdaOptions = IdaOptions(),
    dtype=jnp.float64,
):
    """Differentiable map params -> y(tout). Initial conditions may depend
    on the parameters through ``yy0_of``/``yp0_of``."""

    def f(p):
        prob = problem_factory(p)
        st = init_state(prob, yy0_of(p), yp0_of(p), dtype=dtype, opts=opts)
        st, _, _ = core_solve(st, prob, opts, tol, jnp.asarray(tout, dtype), TASK_NORMAL)
        return st.yy

    return f


def make_consistent_ic(
    problem_factory,
    icopt: str,
    tout1,
    tol: TolControl,
    opts: IdaOptions = IdaOptions(),
    dtype=jnp.float64,
    t0=0.0,
):
    """Differentiable consistent-IC computation — the IDAS ``IDASensCalcIC``
    role (sensitivities of the corrected initial conditions), done the JAX
    way: implicit differentiation of the solved IC system.

    Returns ``cic(params, yy0, yp0) -> (yyc, ypc, ok)`` where the primal is
    exactly ``core.calc_ic`` (``icopt`` = "ya_ydp" or "y",
    core/calc_ic.py:61) and the derivative comes from the implicit function
    theorem at its solution: with unknowns ``u`` (algebraic y and
    differential y' for YA_YDP; all of y for Y_INIT) satisfying
    ``G(u, p) = F(t0, yy(u), yp(u)) = 0``,

        du/dp = -(dG/du)^{-1} dG/dp

    — one extra Jacobian factorization instead of unrolling the damped
    Newton/linesearch/h-retry iteration (whose while loops have no VJP, and
    whose iteration count is not differentiable anyway). The tangent
    program is linear, so BOTH ``jax.jvp`` (forward sensitivities) and
    ``jax.grad`` (adjoint through the IC solve) work. ``ok`` is returned as
    a 0/1 float with zero tangent; when the primal IC solve failed
    (ok == 0), the implicit derivative is meaningless.
    """
    from .core.calc_ic import calc_ic as core_calc_ic, IC_YA_YDP_INIT, IC_Y_INIT
    from .ops.dense_lu import lu_factor_auto, lu_solve_auto

    icopt_i = {"ya_ydp": IC_YA_YDP_INIT, "y": IC_Y_INIT}[icopt]

    @jax.custom_jvp
    def cic(p, yy0, yp0):
        prob = problem_factory(p)
        st = init_state(prob, yy0, yp0, dtype=dtype, opts=opts)
        # keep the primal IC solve and the JVP's linearization point at the
        # SAME time: calc_ic solves F(state.tn, ., .) = 0 and cic_jvp
        # linearizes G at t0, so state.tn must be t0
        st = st._replace(tn=jnp.asarray(t0, dtype))
        st2, ok = core_calc_ic(
            st, prob, opts, tol, icopt_i, jnp.asarray(tout1, dtype)
        )
        return st2.yy, st2.yp, ok.astype(dtype)

    @cic.defjvp
    def cic_jvp(primals, tangents):
        p, yy0, yp0 = primals
        pdot, yy0dot, yp0dot = tangents
        yyc, ypc, okf = cic(p, yy0, yp0)
        prob = problem_factory(p)
        tt = jnp.asarray(t0, dtype)
        if icopt_i == IC_YA_YDP_INIT:
            if prob.id is None:
                raise ValueError("ya_ydp requires problem.id")
            dm = prob.id.astype(dtype)  # 1 = differential, 0 = algebraic
            sel_yy = lambda u, a: dm * a + (1.0 - dm) * u  # noqa: E731
            sel_yp = lambda u, b: dm * u + (1.0 - dm) * b  # noqa: E731
            u_star = dm * ypc + (1.0 - dm) * yyc
        else:
            sel_yy = lambda u, a: u  # noqa: E731
            sel_yp = lambda u, b: b  # noqa: E731
            u_star = yyc

        def G(u, p_, a, b):
            return problem_factory(p_).res(tt, sel_yy(u, a), sel_yp(u, b))

        fact = lu_factor_auto(jax.jacfwd(G)(u_star, p, yy0, yp0))
        _, gdot = jax.jvp(
            lambda p_, a, b: G(u_star, p_, a, b),
            (p, yy0, yp0),
            (pdot, yy0dot, yp0dot),
        )
        udot = -lu_solve_auto(fact, gdot)
        if icopt_i == IC_YA_YDP_INIT:
            yycdot = dm * yy0dot + (1.0 - dm) * udot
            ypcdot = dm * udot + (1.0 - dm) * yp0dot
        else:
            yycdot, ypcdot = udot, yp0dot
        return (yyc, ypc, okf), (yycdot, ypcdot, jnp.zeros_like(okf))

    return cic


def _reverse_opts(opts):
    """Force the reverse-differentiable loop forms: lax.while_loop has no
    VJP, so the adjoint path runs the unrolled Newton loop and the
    static-bounded Illinois root loop (arithmetic per lane unchanged)."""
    if opts is None:
        opts = IdaOptions()
    if not (opts.unroll_newton and opts.unroll_roots):
        opts = dataclasses.replace(opts, unroll_newton=True, unroll_roots=True)
    return opts


def adjoint_gradient(
    problem_factory,
    params,
    yy0_of,
    yp0_of,
    tol: TolControl,
    tout,
    loss_of,
    opts: IdaOptions | None = None,
    max_attempts: int = 500,
    dtype=jnp.float64,
    loss_of_state=None,
    ic=None,
):
    """Reverse-mode (discrete-adjoint) gradient of ``loss_of(y(tout))``
    with respect to ``params`` — the IDAS adjoint (IDAA) analogue.

    Returns ``(loss, grad, istate)``. ``istate`` is the solver return code
    (0 = success); the gradient is only meaningful when the solve
    succeeded. ``max_attempts`` bounds the differentiated attempt loop —
    it must cover the whole integration (the canonical Roberts decade-1
    run takes ~80 attempts to t=4e4) or ``istate`` stays CONTINUE.

    ``loss_of_state`` (optional, overrides ``loss_of``) receives
    ``(state, tret, problem)`` and must return a scalar — use this for
    losses on quadrature integrals (``core.quad.get_quad(state, problem,
    tret)``), counters, or anything beyond y(tout).

    ``opts.unroll_newton`` is forced True (the while-form Newton loop has
    no VJP rule). Rootfinding problems (nroots > 0) are supported only
    via the bounded Illinois iteration already used by the solver.

    ``ic`` (optional): ``("ya_ydp" | "y", tout1)`` — first compute
    consistent initial conditions from the (possibly inconsistent)
    ``yy0_of(p)``/``yp0_of(p)`` guesses with ``calc_ic``, differentiating
    THROUGH the IC solve by implicit differentiation
    (``make_consistent_ic``), then integrate. This is how to take
    gradients on problems like the food web whose ICs only exist via
    IDACalcIC.
    """
    opts = _reverse_opts(opts)

    f = _make_loss_fn(
        problem_factory, yy0_of, yp0_of, tol, tout, loss_of, opts,
        max_attempts, dtype, loss_of_state, ic,
    )
    with safe_ad():
        (val, istate), grad = jax.value_and_grad(f, has_aux=True)(params)
    return val, grad, istate


def _make_loss_fn(
    problem_factory, yy0_of, yp0_of, tol, tout, loss_of, opts,
    max_attempts, dtype, loss_of_state, ic,
):
    cic = (
        make_consistent_ic(
            problem_factory, ic[0], ic[1], tol, opts=opts, dtype=dtype
        )
        if ic is not None
        else None
    )

    def f(p):
        prob = problem_factory(p)
        yy0, yp0 = yy0_of(p), yp0_of(p)
        ic_ok = None
        if cic is not None:
            yy0, yp0, ic_ok = cic(p, yy0, yp0)
        st = init_state(prob, yy0, yp0, dtype=dtype, opts=opts)
        out = core_solve(
            st, prob, opts, tol, jnp.asarray(tout, dtype), TASK_NORMAL,
            max_attempts=max_attempts,
        )
        istate = out[2]
        if ic_ok is not None:
            # surface a failed IC solve (its implicit derivative is
            # meaningless) as CONV_FAIL — C IDACalcIC's failure code —
            # instead of silently integrating from the uncorrected guess
            from . import constants as C

            istate = jnp.where(
                ic_ok > 0.0, istate, jnp.asarray(C.CONV_FAIL, istate.dtype)
            )
        if loss_of_state is not None:
            return loss_of_state(out[0], out[1], prob), istate
        return loss_of(out[0].yy), istate

    return f


def batched_adjoint_gradient(
    problem_factory,
    params,
    yy0_of,
    yp0_of,
    tol: TolControl,
    tout,
    loss_of,
    opts: IdaOptions | None = None,
    max_attempts: int = 500,
    dtype=jnp.float64,
    loss_of_state=None,
    ic=None,
):
    """Vmapped ``adjoint_gradient`` over a leading batch axis of ``params``
    — one compiled program computing per-lane losses AND per-lane
    gradients for an ensemble (e.g. multi-start parameter estimation).
    ``yy0_of``/``yp0_of``/``loss_of`` are per-lane maps, applied under
    vmap. Returns ``(vals[B], grads[B, ...], istates[B])``."""
    opts = _reverse_opts(opts)

    f = _make_loss_fn(
        problem_factory, yy0_of, yp0_of, tol, tout, loss_of, opts,
        max_attempts, dtype, loss_of_state, ic,
    )
    with safe_ad():
        (vals, istates), grads = jax.vmap(
            jax.value_and_grad(f, has_aux=True)
        )(params)
    return vals, grads, istates


def adjoint_hvp(
    problem_factory,
    params,
    yy0_of,
    yp0_of,
    tol: TolControl,
    tout,
    loss_of,
    tangent,
    opts: IdaOptions | None = None,
    max_attempts: int = 500,
    dtype=jnp.float64,
    loss_of_state=None,
    ic=None,
):
    """Second-order sensitivity: the Hessian-vector product
    ``(d²L/dp²) · tangent`` of a scalar loss of the solution, by
    forward-over-reverse AD through the solver (jvp of the discrete-adjoint
    gradient). Even IDAS has no second-order machinery; here it is one more
    functional transform over the same traced integrator. Returns
    ``(grad, hvp, istate)`` — the gradient comes for free from the jvp
    primal, and ``istate`` is the solver return code (grad/hvp are only
    meaningful when the solve succeeded). Build the full (small) Hessian
    by mapping over basis tangents."""
    opts = _reverse_opts(opts)

    f = _make_loss_fn(
        problem_factory, yy0_of, yp0_of, tol, tout, loss_of, opts,
        max_attempts, dtype, loss_of_state, ic,
    )

    def gradf(p):
        g, ist = jax.grad(f, has_aux=True)(p)
        # float-cast so the aux rides through jvp (its tangent is zero —
        # istate comes from integer lanes)
        return g, ist.astype(dtype)

    with safe_ad():
        (grad, istf), (hvp, _) = jax.jvp(gradf, (params,), (tangent,))
    return grad, hvp, jnp.asarray(istf, jnp.int32)


def forward_sensitivity(
    problem_factory,
    params,
    yy0_of,
    yp0_of,
    tol: TolControl,
    tout,
    tangent,
    opts: IdaOptions = IdaOptions(),
):
    """One jvp: returns (y(tout), dy/dp . tangent)."""
    f = solve_with_params(problem_factory, params, yy0_of, yp0_of, tol, tout, opts)
    return jax.jvp(f, (params,), (tangent,))
