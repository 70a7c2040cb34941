"""Trace-time "safe AD" mode for reverse-mode differentiation.

The solver's loop bodies are self-masked: inactive or not-yet-initialized
lanes compute garbage (often ``inf``/``nan`` from divisions by zeroed
``psi``/``beta`` entries) that a ``jnp.where`` discards. Forward-mode AD
and plain evaluation are untouched by this, but REVERSE-mode AD is not:
the VJP of ``x / y`` multiplies the (zero) incoming cotangent by the
(infinite) partial ``-x / y**2``, and ``0 * inf = nan`` leaks a NaN into
otherwise-masked gradients. This is the standard JAX "where-grad" pitfall
(the fix is the standard double-where / safe-denominator trick).

``safe_ad()`` flips a TRACE-TIME flag; under it, ``smask_den`` /
``smask_pos`` substitute a harmless 1 for zero denominators (or
non-positive power bases) whose quotient is provably discarded by a
downstream mask. Outside the context these helpers are identity
functions, so the C-parity compute path is byte-identical to before —
the guards exist only in traces made for ``jax.grad``/``jax.vjp``.

Note: the flag is read at TRACE time. Functions jitted inside the
context bake the guards in; the adjoint API (``sensitivity.py``) builds
its own closures, so normal solves never share a cache entry with
safe-AD traces.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp

_SAFE = False


def is_safe_ad() -> bool:
    """True while tracing under ``safe_ad()``."""
    return _SAFE


@contextmanager
def safe_ad():
    """Enable safe-denominator guards for reverse-mode AD while tracing."""
    global _SAFE
    old = _SAFE
    _SAFE = True
    try:
        yield
    finally:
        _SAFE = old


def smask_den(y):
    """Denominator guard: 1 where y == 0 (identity outside safe_ad)."""
    if not _SAFE:
        return y
    return jnp.where(y == 0.0, jnp.ones_like(y), y)


def smask_pos(y):
    """Power-base/sqrt-argument guard: 1 where y <= 0 (identity outside
    safe_ad). For expressions like ``y ** (-1/k)`` whose result is
    select-discarded when y <= 0."""
    if not _SAFE:
        return y
    return jnp.where(y <= 0.0, jnp.ones_like(y), y)


def ssqrt(x):
    """PRIMAL-PRESERVING sqrt with a finite gradient at x == 0 (the
    double-where trick): sqrt(0) stays 0, but the backward pass sees the
    constant branch instead of the 1/(2*sqrt(0)) = inf partial. Identity
    outside safe_ad. Needed because WRMS norms of exactly-zero vectors
    (converged lanes running masked extra iterations) are legitimate
    primal values whose cotangent must not turn into 0 * inf."""
    if not _SAFE:
        return jnp.sqrt(x)
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), jnp.zeros_like(x))


def spow(base, expo):
    """PRIMAL-PRESERVING ``base ** expo`` for base >= 0 with finite
    gradients at base == 0 (and for garbage negative bases in masked
    lanes, where the result is select-discarded downstream): the zero /
    negative branch returns 0 with zero partials. Identity outside
    safe_ad."""
    if not _SAFE:
        return base ** expo
    pos = base > 0.0
    return jnp.where(
        pos, jnp.where(pos, base, 1.0) ** expo, jnp.zeros_like(base)
    )
