"""The NON-PARITY fast_math mode (VERDICT r3 item 2 / NEXT.md lever 1a).

``IdaOptions.fast_math`` keeps phi unscaled and folds the phi-star beta
scaling into its consumers (core/coeffs.py phi_star_scale). It changes
floating-point association, so step sequences are not guaranteed
bit-identical to C IDA — these tests pin down what IS guaranteed: the
trajectory stays within the integration tolerance (reference-value WRMS
< 1, the idaRoberts_dns check_ans criterion), failure/retry paths still
work, and the mode composes with the dense-output sweep and batching.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaSolveStatus
from ida_tpu import constants as C
from ida_tpu.core.state import IdaOptions
from ida_tpu.models import roberts_problem
from ida_tpu.tol_control import tol_sv

Y0 = jnp.asarray([1.0, 0.0, 0.0])
YP0 = jnp.asarray([-0.04, 0.04, 0.0])
REF_T4E10 = np.array([5.2083474e-08, 2.0833391e-13, 9.9999995e-01])


def _tol():
    return tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))


def _wrms_vs_ref(y):
    w = 1.0 / (1e-4 * np.abs(REF_T4E10) + np.array([1e-8, 1e-6, 1e-6]))
    return float(np.sqrt(np.mean(((np.asarray(y) - REF_T4E10) * w) ** 2)))


def test_fast_math_roberts_12_decades_check_ans():
    """The canonical accuracy gate: 12 decades, final-state WRMS vs the
    C-SUNDIALS reference values < 1 (same criterion as parity mode)."""
    ida = IDA(roberts_problem(with_roots=False), Y0, YP0, _tol(),
              options=IdaOptions(fast_math=True))
    t = 0.4
    while t <= 4e10:
        tret, status = ida.solve(t)
        assert status == IdaSolveStatus.Success
        t *= 10
    assert _wrms_vs_ref(ida.get_yy()) < 1.0


def test_fast_math_tracks_parity_mode_per_decade():
    """fast_math vs parity trajectories at every decade: agreement bounded
    by the integration tolerance (both are valid rtol=1e-4 solutions; they
    may take different step sequences), measured far tighter in practice."""
    ida_f = IDA(roberts_problem(with_roots=False), Y0, YP0, _tol(),
                options=IdaOptions(fast_math=True))
    ida_p = IDA(roberts_problem(with_roots=False), Y0, YP0, _tol())
    t = 0.4
    while t <= 4e10:
        ida_f.solve(t)
        ida_p.solve(t)
        yf, yp_ = np.asarray(ida_f.get_yy()), np.asarray(ida_p.get_yy())
        # per-component mixed tolerance, same shape as the solver's own
        np.testing.assert_allclose(
            yf, yp_, rtol=1e-3, atol=1e-9,
            err_msg=f"decade t={t:g}",
        )
        t *= 10


def test_fast_math_failure_paths_recover():
    """The restore-free failure path: a residual that overflows at the
    hin=100 first step (REC_RESIDUAL h/4 retries) must still recover and
    land on the plain trajectory."""
    from tests.test_res_failure import _bombed_roberts

    ida = IDA(_bombed_roberts(), Y0, YP0, _tol(),
              options=IdaOptions(fast_math=True))
    ida.set_initial_step(100.0)
    tret, status = ida.solve(0.4)
    assert status == IdaSolveStatus.Success
    assert ida.get_num_nonlin_solv_conv_fails() >= 1

    ida_p = IDA(roberts_problem(with_roots=False), Y0, YP0, _tol())
    ida_p.solve(0.4)
    np.testing.assert_allclose(
        np.asarray(ida.get_yy()), np.asarray(ida_p.get_yy()), rtol=1e-3
    )


def test_fast_math_dense_output_and_events():
    """fast_math composes with the fused dense sweep and its event buffer:
    the two Roberts root times land within rootfinder tolerance of the
    parity-mode sweep."""
    grid = 0.4 * 10.0 ** np.arange(12)
    ida_f = IDA(roberts_problem(with_roots=True), Y0, YP0, _tol(),
                options=IdaOptions(fast_math=True))
    *_rows_f, ev_f = ida_f.solve_grid(grid, max_events=4)
    ida_p = IDA(roberts_problem(with_roots=True), Y0, YP0, _tol())
    *_rows_p, ev_p = ida_p.solve_grid(grid, max_events=4)
    assert int(ev_f.count) == int(ev_p.count) == 2
    np.testing.assert_allclose(
        np.asarray(ev_f.t[:2]), np.asarray(ev_p.t[:2]), rtol=1e-6
    )


def test_fast_math_batched():
    """Batch-native fast_math at B=64: every lane solves and matches its
    parity-mode twin within tolerance."""
    from functools import partial

    from ida_tpu.core.solve import solve as core_solve
    from ida_tpu.models import ROBERTS_PARAMS, roberts_factory
    from ida_tpu.parallel import ensemble_init

    B = 64
    scale = np.exp(np.linspace(-0.1, 0.1, B))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(Y0, (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])

    from ida_tpu.tol_control import TolControl

    atol = jnp.asarray([1e-8, 1e-6, 1e-6])
    tol_T = TolControl(
        rtol=jnp.full((B,), 1e-4), atol=jnp.tile(atol[:, None], (1, B))
    )
    outs = {}
    for fm in (False, True):
        opts = IdaOptions(fast_math=fm)
        states = ensemble_init(roberts_factory, params, yy0, yp0, opts=opts)
        states_T = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, -1), states
        )
        prob_T = roberts_factory(jnp.moveaxis(params, 0, -1))
        fn = jax.jit(partial(core_solve, problem=prob_T, opts=opts, tol=tol_T))
        st, tret, ist = fn(states_T, tout=jnp.full((B,), 4000.0))
        assert np.all(np.asarray(ist) == C.SUCCESS)
        outs[fm] = np.asarray(st.yy)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3, atol=1e-10)
