"""Forward sensitivities (dy/dp) by AD through the adaptive solver —
capability absent from the reference and from C IDA (needs IDAS/FSA)."""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.sensitivity import forward_sensitivity, solve_with_params
from ida_tpu.tol_control import tol_sv


def _setup():
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    yy0_of = lambda p: jnp.asarray(ROBERTS_YY0)  # noqa: E731
    yp0_of = lambda p: p[0] * jnp.asarray([-1.0, 1.0, 0.0])  # noqa: E731
    return tol, yy0_of, yp0_of


def test_jvp_matches_finite_differences():
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    v = jnp.asarray([1.0, 0.0, 0.0])  # sensitivity to k1

    y, dy = forward_sensitivity(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, v
    )
    f = solve_with_params(roberts_factory, p0, yy0_of, yp0_of, tol, 4.0)
    eps = 1e-7
    fd = (f(p0 + eps * v) - f(p0 - eps * v)) / (2 * eps)

    np.testing.assert_allclose(np.asarray(dy), np.asarray(fd), rtol=1e-5)
    # sanity: mass conservation => sensitivities sum to ~0
    assert abs(float(jnp.sum(dy))) < 1e-6 * float(jnp.max(jnp.abs(dy)))


def test_jvp_under_jit_and_batch():
    tol, yy0_of, yp0_of = _setup()
    f = solve_with_params(roberts_factory, jnp.asarray(ROBERTS_PARAMS), yy0_of, yp0_of, tol, 4.0)

    # all three parameter directions at once, jitted
    @jax.jit
    def jac(p):
        return jax.jacfwd(f)(p)

    j = jac(jnp.asarray(ROBERTS_PARAMS))
    assert j.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(j)))
    # dy1/dk1 < 0 (faster decay of y1), dy3/dk1 > 0
    assert float(j[0, 0]) < 0 < float(j[2, 0])
