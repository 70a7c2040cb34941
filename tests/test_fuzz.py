"""Fuzz sweep: random chemistry and initial conditions over a vmapped batch.
Every lane must either reach tout (finite, error-test-satisfying solution)
or report a clean failure status — never NaNs in a lane that claims success."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import constants as C
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
from ida_tpu.parallel import EnsembleIDA
from ida_tpu.tol_control import tol_sv


def test_fuzz_roberts_ensemble():
    rng = np.random.default_rng(42)
    b = 64
    # chemistry varying over 2 orders of magnitude in each rate
    scale = 10.0 ** rng.uniform(-1.0, 1.0, size=(b, 3))
    params = jnp.asarray(scale * ROBERTS_PARAMS)
    # slightly perturbed (still consistent) initial conditions
    y1 = 1.0 - rng.uniform(0.0, 1e-3, b)
    y2 = rng.uniform(0.0, 1e-3 / 2, b)
    y3 = 1.0 - y1 - y2
    yy0 = jnp.asarray(np.stack([y1, y2, y3], axis=1))
    k1 = params[:, 0]
    k2 = params[:, 1]
    k3 = params[:, 2]
    r0 = -k1 * yy0[:, 0] + k2 * yy0[:, 1] * yy0[:, 2]
    r1 = -r0 - k3 * yy0[:, 1] ** 2
    yp0 = jnp.stack([r0, r1, jnp.zeros(b)], axis=1)

    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    tret, istate = ens.solve(4.0)

    ok = istate == C.SUCCESS
    # the sweep stays in a well-posed regime: expect a high success rate
    assert ok.mean() > 0.9, ens.status_names(istate)
    # successful lanes: finite, conservation law holds, tret correct
    y = ens.yy[ok]
    assert np.all(np.isfinite(y))
    np.testing.assert_allclose(y.sum(axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(tret[ok], 4.0)
    # failed lanes (if any) report recognizable codes
    for s in istate[~ok]:
        assert int(s) in C.STATUS_NAMES
