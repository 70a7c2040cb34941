"""solve_dense — the barrier-free (single while loop) form of
solve_grid's scan-over-solve. Its contract: on all-success paths every
lane's stepping sequence, interpolated outputs, per-row statuses, and final
counters are BIT-IDENTICAL to the scan form; per-row failures record the
row's code and keep integrating, like the scan form's per-leg re-entry."""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaOptions
from ida_tpu import constants as C
from ida_tpu.core.solve import solve_dense
from ida_tpu.core.state import init_state
from ida_tpu.models import (
    ROBERTS_PARAMS,
    ROBERTS_YY0,
    ROBERTS_YP0,
    roberts_factory,
    roberts_problem,
)
from ida_tpu.tol_control import TolControl, tol_sv

DECADES = 0.4 * 10.0 ** np.arange(12)


def _tol():
    return tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))


def test_dense_output_matches_scan_single():
    """Single instance, the canonical 12-decade Roberts grid: every row and
    the final solver state must match the lax.scan form bit for bit."""
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, _tol())
    tret_s, ist_s, yy_s, yp_s = ida.solve_grid(DECADES, fused=False)
    assert np.all(ist_s == C.SUCCESS)

    prob = roberts_problem(with_roots=False)
    st = init_state(prob, jnp.asarray(ROBERTS_YY0), jnp.asarray(ROBERTS_YP0))
    fn = jax.jit(
        lambda st, touts: solve_dense(st, prob, IdaOptions(), _tol(), touts)
    )
    st2, tret_d, ist_d, yy_d, yp_d, nst_d = fn(st, jnp.asarray(DECADES))

    assert np.array_equal(np.asarray(ist_d), ist_s)
    assert np.array_equal(np.asarray(tret_d), tret_s)
    assert np.array_equal(np.asarray(yy_d), yy_s), (
        np.asarray(yy_d) - yy_s
    )
    assert np.array_equal(np.asarray(yp_d), yp_s)
    # identical stepping: the canonical counters agree exactly
    assert int(st2.nst) == ida.get_num_steps()
    assert int(st2.nre) == ida.get_num_res_evals()
    assert int(st2.nni) == ida.get_num_nonlin_solv_iters()
    assert int(st2.netf) == ida.get_num_err_test_fails()
    assert int(st2.nje) == ida.get_num_jac_evals()
    # per-row cumulative nst is monotone and ends at the total
    nst = np.asarray(nst_d)
    assert np.all(np.diff(nst) >= 0) and nst[-1] == int(st2.nst)


def test_dense_output_batch_native_heterogeneous():
    """Batch-native (trailing batch) ensemble with spread chemistry: the
    fused solve_dense must equal the SAME-layout scan-over-solve bit for
    bit — lanes advance rows independently, so this pins the no-barrier
    scheduling as arithmetically inert. (Cross-LAYOUT agreement — batched
    vs single-instance — is only to rounding, as XLA fuses the two shapes
    differently; that axis is covered at tolerance level below and bitwise
    vmapped-vs-native in test_batch_native.)"""
    import functools

    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.parallel import ensemble_init

    B = 4
    scale = np.exp(np.linspace(-0.2, 0.2, B))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])

    states = ensemble_init(roberts_factory, params, yy0, yp0)
    states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
    prob_T = roberts_factory(jnp.moveaxis(params, 0, -1))
    atol = jnp.asarray([1e-8, 1e-6, 1e-6])
    tol_T = TolControl(
        rtol=jnp.full((B,), 1e-4), atol=jnp.tile(atol[:, None], (1, B))
    )
    touts = jnp.asarray(DECADES[:6])
    fn = jax.jit(
        lambda st, touts: solve_dense(st, prob_T, IdaOptions(), tol_T, touts)
    )
    stf, tret_d, ist_d, yy_d, yp_d, nst_d = fn(states_T, touts)

    # same-layout scan form (the bench's fused=False shape)
    solve1 = functools.partial(
        core_solve, problem=prob_T, opts=IdaOptions(), tol=tol_T,
        itask=TASK_NORMAL,
    )

    def sweep(st, touts):
        def one(st, tout):
            st, tret, ist = solve1(st, tout=jnp.full((B,), tout))
            return st, (tret, ist, st.yy, st.yp, st.nst)

        return jax.lax.scan(one, st, touts)

    sts, (tret_s, ist_s, yy_s, yp_s, nst_s) = jax.jit(sweep)(states_T, touts)
    assert np.all(np.asarray(ist_s) == C.SUCCESS)
    assert np.array_equal(np.asarray(ist_d), np.asarray(ist_s))
    assert np.array_equal(np.asarray(tret_d), np.asarray(tret_s))
    # scan rows are [T, N, B] too (batch-native yy is [N, B])
    assert np.array_equal(np.asarray(yy_d), np.asarray(yy_s))
    assert np.array_equal(np.asarray(yp_d), np.asarray(yp_s))
    assert np.array_equal(np.asarray(nst_d), np.asarray(nst_s))
    assert np.array_equal(np.asarray(stf.nst), np.asarray(sts.nst))

    # cross-layout sanity: each lane agrees with its single-instance scan
    # run to tolerance level (bitwise is layout-fragile, see docstring)
    for k in range(B):
        ida = IDA(
            roberts_factory(params[k]), yy0[k], yp0[k],
            tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6])),
        )
        tret_1, ist_1, yy_1, yp_1 = ida.solve_grid(DECADES[:6], fused=False)
        assert np.array_equal(np.asarray(ist_d[:, k]), ist_1), k
        np.testing.assert_allclose(
            np.asarray(yy_d[:, :, k]), yy_1, rtol=1e-4, atol=1e-9
        )


def test_dense_output_failed_lane_records_and_isolates():
    """A lane driven into TOO_MUCH_WORK (tiny mxstep) records the failure
    code at each unreachable row while healthy lanes are untouched."""
    prob = roberts_problem(with_roots=False)
    st = init_state(prob, jnp.asarray(ROBERTS_YY0), jnp.asarray(ROBERTS_YP0))
    opts = IdaOptions(mxstep=3)
    fn = jax.jit(
        lambda st, touts: solve_dense(st, prob, opts, _tol(), touts)
    )
    st2, tret_d, ist_d, yy_d, yp_d, nst_d = fn(st, jnp.asarray(DECADES[:4]))
    ist = np.asarray(ist_d)
    # 3 steps/row cannot reach any decade from cold start; every row records
    # TOO_MUCH_WORK (the scan form returns the same code per leg)
    assert ist[0] == C.TOO_MUCH_WORK, ist
    # rows keep being attempted (budget refreshes per row, like scan legs);
    # whatever later rows report, the run terminates and flags every row
    assert np.all((ist == C.TOO_MUCH_WORK) | (ist == C.SUCCESS)), ist
    # and it matches the scan form row for row
    ida = IDA(prob, ROBERTS_YY0, ROBERTS_YP0, _tol(), options=opts)
    tret_s, ist_s, yy_s, yp_s = ida.solve_grid(DECADES[:4], fused=False)
    assert np.array_equal(ist, ist_s)
    assert np.array_equal(np.asarray(tret_d), tret_s)
    assert np.array_equal(np.asarray(yy_d), yy_s)


def test_dense_output_ensemble_wrapper_matches_scan():
    """EnsembleIDA.solve_grid fused auto-select (vmapped solve_dense) must
    match the vmapped scan form bit for bit, rows in [T, B] layout."""
    from ida_tpu.parallel import EnsembleIDA

    B = 3
    scale = np.exp(np.linspace(-0.1, 0.1, B))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    grid = DECADES[:4]

    ens_f = EnsembleIDA(roberts_factory, params, yy0, yp0, _tol())
    tret_f, ist_f, yy_f, yp_f = ens_f.solve_grid(grid)  # fused auto-select
    assert ("grid_fused", 0) in ens_f._solvers  # the auto-select actually fired

    ens_s = EnsembleIDA(roberts_factory, params, yy0, yp0, _tol())
    tret_s, ist_s, yy_s, yp_s = ens_s.solve_grid(grid, fused=False)

    assert np.all(ist_f == C.SUCCESS)
    assert np.array_equal(ist_f, ist_s)
    assert np.array_equal(tret_f, tret_s)
    assert np.array_equal(yy_f, yy_s)
    assert np.array_equal(yp_f, yp_s)
    assert np.array_equal(np.asarray(ens_f.states.nst), np.asarray(ens_s.states.nst))
