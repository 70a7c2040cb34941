"""Second-order sensitivities: Hessian-vector products through the whole
adaptive solver by forward-over-reverse AD (sensitivity.adjoint_hvp).
Beyond even IDAS, which has no second-order machinery. Oracle: central
finite differences of the first-order adjoint gradient."""

import jax.numpy as jnp
import numpy as np

from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.sensitivity import adjoint_gradient, adjoint_hvp
from ida_tpu.tol_control import tol_sv

_W = jnp.asarray([1.0, 2.0, 3.0])


def _setup():
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    yy0_of = lambda p: jnp.asarray(ROBERTS_YY0)  # noqa: E731
    yp0_of = lambda p: p[0] * jnp.asarray([-1.0, 1.0, 0.0])  # noqa: E731
    return tol, yy0_of, yp0_of


def test_hvp_matches_fd_of_gradient():
    tol, yy0_of, yp0_of = _setup()
    p0 = jnp.asarray(ROBERTS_PARAMS)
    loss_of = lambda y: jnp.sum(y * _W)  # noqa: E731
    # direction along k1 (the O(1)-scale parameter; k2/k3 are 1e4/3e7 and
    # their Hessian rows are ~1e-10 — fd would be pure cancellation noise)
    v = jnp.asarray([1.0, 0.0, 0.0])

    grad, hvp, istate = adjoint_hvp(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of, v,
        max_attempts=120,
    )
    assert int(istate) == 0
    assert np.all(np.isfinite(np.asarray(hvp)))

    # the jvp primal must equal the plain adjoint gradient
    val1, grad1, istate1 = adjoint_gradient(
        roberts_factory, p0, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    assert int(istate1) == 0
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad1), rtol=1e-12)

    # central differences of the adjoint gradient along v
    eps = 4e-7 * float(p0[0])
    _, gp, _ = adjoint_gradient(
        roberts_factory, p0 + eps * v, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    _, gm, _ = adjoint_gradient(
        roberts_factory, p0 - eps * v, yy0_of, yp0_of, tol, 4.0, loss_of,
        max_attempts=120,
    )
    fd = (np.asarray(gp) - np.asarray(gm)) / (2 * eps)
    # compare the k1 component (O(1)); the k2/k3 rows are ~1e-10/1e-18 and
    # below fd resolution
    scale = max(abs(fd[0]), 1e-10)
    assert abs(float(hvp[0]) - fd[0]) / scale < 5e-3, (hvp, fd)
