"""Whole-solve-in-one-Pallas-kernel (interpret mode): bit-identical to the
general vmapped XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu.core.state import IdaOptions
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.ops.fused_solve import make_fused_solve
from ida_tpu.parallel import ensemble_init, make_ensemble_solve
from ida_tpu.norms import unrolled_reduces
from ida_tpu.tol_control import tol_sv


def test_fused_matches_general_path():
    dtype = jnp.float32
    b, tile = 8, 4
    scale = np.linspace(0.9, 1.1, b)
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (b, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    tol = tol_sv(1e-4, jnp.asarray([1e-6, 1e-6, 1e-6], dtype), dtype=dtype)
    opts = IdaOptions()
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype, opts=opts)

    fused = make_fused_solve(roberts_factory, tol, opts, tile=tile, interpret=True)
    st_f, tret_f, ist_f = fused(states, params, 0.4)

    # bit-identity holds against the XLA path traced with the SAME reduce
    # association the kernel uses (unrolled row-sums; see norms.py) — XLA's
    # own reduce rounds differently in f32, so the default path is compared
    # with a tolerance instead
    ref = make_ensemble_solve(roberts_factory, opts, donate=False)
    with unrolled_reduces():
        st_r, tret_r, ist_r = ref(states, params, tol, jnp.asarray(0.4, dtype))

    np.testing.assert_array_equal(np.asarray(ist_f), np.asarray(ist_r))
    np.testing.assert_array_equal(np.asarray(st_f.nst), np.asarray(st_r.nst))
    np.testing.assert_array_equal(np.asarray(st_f.yy), np.asarray(st_r.yy))
    np.testing.assert_array_equal(np.asarray(tret_f), np.asarray(tret_r))
    # counters survive the int32 packing
    np.testing.assert_array_equal(np.asarray(st_f.nni), np.asarray(st_r.nni))

    ref_d = make_ensemble_solve(roberts_factory, opts, donate=False)
    st_d, tret_d, ist_d = ref_d(states, params, tol, jnp.asarray(0.4, dtype))
    np.testing.assert_array_equal(np.asarray(ist_f), np.asarray(ist_d))
    np.testing.assert_allclose(np.asarray(st_f.yy), np.asarray(st_d.yy),
                               rtol=2e-2, atol=1e-6)


def test_budgeted_fused_matches_general_path():
    """attempt_budget (static scf.for in-kernel + host continuation) is
    bit-identical to the one-shot fused kernel and the XLA path."""
    dtype = jnp.float32
    b, tile = 8, 4
    scale = np.linspace(0.9, 1.1, b)
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (b, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    tol = tol_sv(1e-4, jnp.asarray([1e-6, 1e-6, 1e-6], dtype), dtype=dtype)
    opts = IdaOptions()
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype, opts=opts)

    fused = make_fused_solve(roberts_factory, tol, opts, tile=tile,
                             interpret=True, attempt_budget=6)
    st_f, tret_f, ist_f = fused(states, params, 0.4)

    ref = make_ensemble_solve(roberts_factory, opts, donate=False)
    with unrolled_reduces():
        st_r, tret_r, ist_r = ref(states, params, tol, jnp.asarray(0.4, dtype))

    np.testing.assert_array_equal(np.asarray(ist_f), np.asarray(ist_r))
    np.testing.assert_array_equal(np.asarray(st_f.nst), np.asarray(st_r.nst))
    np.testing.assert_array_equal(np.asarray(st_f.yy), np.asarray(st_r.yy))
    np.testing.assert_array_equal(np.asarray(tret_f), np.asarray(tret_r))
    np.testing.assert_array_equal(np.asarray(st_f.nni), np.asarray(st_r.nni))
