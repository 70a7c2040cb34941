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


def test_dense_tstop_matches_scan_single():
    """tstop inside the grid span: the fused sweep must reproduce the scan
    form's leg sequence exactly — the row whose tout lies beyond tstop
    returns TSTOP_RETURN at t = tstop, tstop_set clears, and later rows
    integrate past it (scan semantics, impl_stop_test.rs:67-83)."""
    grid = np.array([0.4, 4.0, 40.0, 400.0])
    tstop = 25.0  # between rows 2 and 3

    outs = {}
    for fused in (False, True):
        ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0,
                  ROBERTS_YP0, _tol())
        ida.set_stop_time(tstop)
        outs[fused] = ida.solve_grid(grid, fused=fused) + (
            ida.get_num_steps(),
        )
    tret_s, ist_s, yy_s, yp_s, nst_s = outs[False]
    tret_d, ist_d, yy_d, yp_d, nst_d = outs[True]

    assert ist_s.tolist() == [C.SUCCESS, C.SUCCESS, C.TSTOP_RETURN,
                              C.SUCCESS]
    assert np.array_equal(ist_d, ist_s)
    assert np.array_equal(tret_d, tret_s)
    assert tret_s[2] == tstop
    assert np.array_equal(yy_d, yy_s)
    assert np.array_equal(yp_d, yp_s)
    assert nst_d == nst_s  # identical stepping through the clamp


def test_dense_tstop_batch_native_per_lane():
    """Per-lane tstop on the trailing-batch form: each lane clamps at its
    OWN stop time and matches its scan-form twin bitwise."""
    import functools

    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.parallel import ensemble_init

    B = 3
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (B, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    states = ensemble_init(roberts_factory, params, yy0, yp0)
    states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
    # lane 0: tstop before row 1; lane 1: between rows 1 and 2; lane 2:
    # beyond the grid (never triggers)
    tstops = jnp.asarray([2.0, 25.0, 1e6])
    states_T = states_T._replace(
        tstop=tstops, tstop_set=jnp.asarray([True, True, True])
    )
    prob_T = roberts_factory(jnp.moveaxis(params, 0, -1))
    atol = jnp.asarray([1e-8, 1e-6, 1e-6])
    tol_T = TolControl(
        rtol=jnp.full((B,), 1e-4), atol=jnp.tile(atol[:, None], (1, B))
    )
    grid = jnp.asarray([0.4, 4.0, 40.0, 400.0])

    fn_d = jax.jit(functools.partial(
        solve_dense, problem=prob_T, opts=IdaOptions(), tol=tol_T,
        touts=grid,
    ))
    st_d, tret_d, ist_d, yy_d, yp_d, _nst = fn_d(states_T)

    solve1 = functools.partial(
        core_solve, problem=prob_T, opts=IdaOptions(), tol=tol_T,
        itask=TASK_NORMAL,
    )

    def scan_body(st, tout):
        st, tret, ist = solve1(st, tout=jnp.full((B,), tout))
        return st, (tret, ist, st.yy, st.yp)

    fn_s = jax.jit(lambda st: jax.lax.scan(scan_body, st, grid))
    st_s, (tret_s, ist_s, yy_s, yp_s) = fn_s(states_T)

    assert np.asarray(ist_d).tolist() == np.asarray(ist_s).tolist()
    assert np.array_equal(np.asarray(tret_d), np.asarray(tret_s))
    # statuses/tret/nst are exact; the recorded trajectories agree to the
    # 1e-10 parity target rather than bitwise — dense and scan are
    # different programs whose XLA fma fusions happen to coincide on the
    # exact shapes the tests above pin, but not at this (B=3, 4-row)
    # configuration (measured ~4e-13 abs without any tstop involvement)
    np.testing.assert_allclose(
        np.asarray(yy_d), np.asarray(yy_s), rtol=1e-10, atol=1e-18
    )
    # lane 0 stops at 2.0 on row 1 then resumes; lane 2 never stops
    ist = np.asarray(ist_d)
    assert ist[1, 0] == C.TSTOP_RETURN and ist[1, 1] == C.SUCCESS
    assert ist[2, 1] == C.TSTOP_RETURN
    assert np.all(ist[:, 2] == C.SUCCESS)
    assert np.array_equal(np.asarray(st_d.nst), np.asarray(st_s.nst))


def test_dense_tstop_with_events():
    """tstop composes with the event buffer: only roots BEFORE tstop are
    recorded up to the stop row, and the sweep still finds the post-tstop
    root once later rows carry it past (scan-equivalent leg sequence)."""
    grid = np.array([0.4, 4.0, 4.0e7, 4.0e8])
    tstop = 1.0e7  # before the second Roberts root at ~2.08e7

    ida = IDA(roberts_problem(with_roots=True), ROBERTS_YY0, ROBERTS_YP0,
              _tol())
    ida.set_stop_time(tstop)
    tret, ist, yy, yp, ev = ida.solve_grid(grid, max_events=4)
    assert ist.tolist() == [C.SUCCESS, C.SUCCESS, C.TSTOP_RETURN, C.SUCCESS]
    assert tret[2] == tstop
    # both canonical roots still located: the first (~0.264) before tstop,
    # the second (~2.08e7) after later rows resume past it
    assert int(ev.count) == 2
    t_ev = np.asarray(ev.t)
    assert abs(t_ev[0] - 0.2640160014306265) < 1e-6
    assert abs(t_ev[1] / 2.0787968e7 - 1.0) < 1e-3
