"""Quadrature integration along the solution — the IDAS quadrature role.

Neither the reference nor plain C IDA integrates user quadratures
``yQ' = q(t, y, y')`` (SURVEY.md §2.3 lists quadrature as an absent IDAS
feature). Here the accumulated integral rides the ordinary step loop:
after every ACCEPTED step, ``∫_{tn-hused}^{tn} q(t, y(t), y'(t)) dt`` is
added to ``state.yQ`` using 3-point Gauss–Legendre on the solver's own
BDF interpolant (core/interp.py::interpolate, the polynomial C IDA's
IDAGetSolution evaluates — reference src/lib.rs:1274-1343).

Accuracy: Gauss-3 integrates the degree-≤5 interpolant exactly, so the
per-step quadrature error is O(h^6) in the smoothness of ``q`` — at or
above the BDF-5 accuracy of y itself. Like IDAS with errconQ=SUNFALSE,
quadrature variables do NOT enter the Newton system or the local error
test; step sizes are controlled by y alone.

``state.yQ`` always holds the integral up to the INTERNAL time ``tn``
(the last completed step). ``get_quad(state, problem, t)`` evaluates the
integral up to any ``t`` inside the last step — the IDAS ``IDAGetQuad``
analogue for the usual case where solve() returned at ``tret < tn``.

Everything is smooth jnp arithmetic, so quadrature losses are
differentiable in both AD modes (``∂/∂p ∫ g(t, y(t; p)) dt`` via
``sensitivity.adjoint_gradient`` — the classic adjoint use case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import interpolate
from .state import IdaState

# 3-point Gauss-Legendre on [-1, 1]: exact for polynomial degree <= 5
_G3 = (
    (-0.7745966692414834, 5.0 / 9.0),  # -sqrt(3/5)
    (0.0, 8.0 / 9.0),
    (0.7745966692414834, 5.0 / 9.0),
)


def quad_increment(
    state: IdaState, problem, a: jax.Array, b: jax.Array
) -> jax.Array:
    """``∫_a^b q(t, y(t), y'(t)) dt`` on the current BDF interpolant.

    Valid for ``a``/``b`` inside the interpolant's window (the last
    completed step, like C IDAGetSolution). Orientation-aware: a zero- or
    backward-width interval yields 0 / the signed integral. Shape:
    [nquad] + batch.
    """
    mid = 0.5 * (a + b)
    half = 0.5 * (b - a)
    acc = None
    for xi, w in _G3:
        t = mid + half * xi
        yy, yp = interpolate(state, t)
        term = w * problem.quad(t, yy, yp)
        acc = term if acc is None else acc + term
    return half * acc


def accumulate_quad(state: IdaState, problem, mask: jax.Array) -> IdaState:
    """Add the last step's quadrature contribution for lanes in ``mask``
    (called from the attempt loop with mask = step accepted)."""
    inc = quad_increment(state, problem, state.tn - state.hused, state.tn)
    return state._replace(yQ=jnp.where(mask, state.yQ + inc, state.yQ))


def get_quad(state: IdaState, problem, t: jax.Array) -> jax.Array:
    """Integral of ``quad`` from t0 to ``t`` (IDAS IDAGetQuad analogue):
    the running accumulator minus the tail from ``t`` to ``tn``. ``t``
    must lie inside the last step, which holds for every solver return
    time (tretlast)."""
    return state.yQ - quad_increment(state, problem, t, state.tn)
