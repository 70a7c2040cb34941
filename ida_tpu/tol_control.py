"""Tolerance control: error-weight vector computation (L1 layer).

Behavioural spec: reference ``src/tol_control.rs:6-83``.

``ewt_i = 1 / (rtol * |y_i| + atol_i)``

The reference uses two static types (``TolControlSS`` scalar/scalar and
``TolControlSV`` scalar/vector). Here a single pytree covers both: ``atol``
is broadcast against ``y``, so a scalar atol is the SS case and a vector
atol the SV case. The pytree rides inside jit and vmaps over a batch of
per-instance tolerances for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TolControl(NamedTuple):
    """Scalar relative tolerance + scalar-or-vector absolute tolerance."""

    rtol: jax.Array
    atol: jax.Array

    def ewt_set(self, ycur: jax.Array) -> jax.Array:
        """Compute the error-weight vector (reference src/tol_control.rs:36-44,71-82)."""
        return 1.0 / (self.rtol * jnp.abs(ycur) + self.atol)


def tol_ss(rtol: float, atol: float, dtype=jnp.float64) -> TolControl:
    """Scalar rtol + scalar atol (reference ``TolControlSS``, src/tol_control.rs:16-45)."""
    return TolControl(jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))


def tol_sv(rtol: float, atol, dtype=jnp.float64) -> TolControl:
    """Scalar rtol + vector atol (reference ``TolControlSV``, src/tol_control.rs:51-83)."""
    return TolControl(jnp.asarray(rtol, dtype), jnp.asarray(atol, dtype))
