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
    """
    if opts is None:
        opts = IdaOptions()
    if not opts.unroll_newton:
        opts = dataclasses.replace(opts, unroll_newton=True)

    def f(p):
        prob = problem_factory(p)
        st = init_state(prob, yy0_of(p), yp0_of(p), dtype=dtype, opts=opts)
        out = core_solve(
            st, prob, opts, tol, jnp.asarray(tout, dtype), TASK_NORMAL,
            max_attempts=max_attempts,
        )
        if loss_of_state is not None:
            return loss_of_state(out[0], out[1], prob), out[2]
        return loss_of(out[0].yy), out[2]

    with safe_ad():
        (val, istate), grad = jax.value_and_grad(f, has_aux=True)(params)
    return val, grad, istate


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
