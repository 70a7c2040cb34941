"""Forward sensitivity analysis via AD through the solver.

The C SUNDIALS family needs a separate package (IDAS) with dedicated
forward-sensitivity equations to compute dy/dp; the reference implements
none of it (SURVEY.md §2.3 lists quadrature/FSA/adjoint as absent). Here
the whole integrator is a pure traced function, so one ``jax.jvp`` through
``core.solve`` yields parameter sensitivities of the numerical solution —
validated against central finite differences to ~1e-7 relative on Roberts
(tests/test_sensitivity.py).

Caveat (inherent to differentiating adaptive solvers, not to this
implementation): the derivative is of the NUMERICAL solution including its
step-size/order control, which is piecewise-smooth in the parameters; for
very tight accuracy on dy/dp, tighten rtol/atol as you would for y itself.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .core.solve import solve as core_solve, TASK_NORMAL
from .core.state import IdaOptions, init_state
from .problem import IdaProblem
from .tol_control import TolControl


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
