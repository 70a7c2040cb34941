"""Small-surface API coverage: setters, error raises, getters, and the
EnsembleIDA convenience layer (COVERAGE.md round-5 triage — every branch
here is a real reference-parity surface, exercised nowhere else).

Reference anchors: setters have no reference equivalent (fields only,
lib.rs:96-231) but mirror C IDASet*; the error raises mirror C IDA return
codes IDA_BAD_T / IDA_BAD_K (reference src/lib.rs get_dky guards,
lib.rs:430-449).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu import IDA, IdaOptions, IdaSolveStatus
from ida_tpu import constants as C
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.solver import IdaError
from ida_tpu.tol_control import tol_sv

TOL = lambda: tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))  # noqa: E731


def _ida(**kw):
    return IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0,
               TOL(), **kw)


def test_setters_take_effect():
    ida = _ida()
    ida.set_initial_step(1e-6)
    ida.set_max_step(0.5)
    ida.set_epcon(0.2)
    assert float(ida.state.hin) == 1e-6
    assert float(ida.state.hmax_inv) == 2.0
    assert float(ida.state.epcon) == 0.2
    ida.solve(0.4)
    # hin is honoured exactly (C IDASetInitStep semantics)
    assert ida.get_actual_init_step() == 1e-6
    # hmax bounds every step taken
    assert ida.get_last_step() <= 0.5 + 1e-12

    # set_max_step(0) restores "no bound" (C IDASetMaxStep(0.0))
    ida2 = _ida()
    ida2.set_max_step(0.0)
    assert float(ida2.state.hmax_inv) == 0.0

    # stop time set + cleared: after clearing, integration passes tstop
    ida3 = _ida()
    ida3.set_stop_time(0.1)
    tret, status = ida3.solve(0.4)
    assert status == IdaSolveStatus.TStop and abs(float(tret) - 0.1) < 1e-12
    ida3.clear_stop_time()
    tret, status = ida3.solve(0.4)
    assert status == IdaSolveStatus.Success


def test_set_root_direction_on_solver():
    from ida_tpu.models import roberts_problem as rp

    ida = IDA(rp(with_roots=True), ROBERTS_YY0, ROBERTS_YP0, TOL())
    ida.set_root_direction([1, -1])
    np.testing.assert_array_equal(np.asarray(ida.state.rootdir), [1, -1])


def test_scalar_getters_after_steps():
    ida = _ida()
    ida.solve(0.4)
    assert 1 <= ida.get_current_order() <= 5
    assert 1 <= ida.get_last_order() <= 5
    assert ida.get_actual_init_step() > 0.0
    assert ida.get_last_step() > 0.0
    assert ida.get_current_step() > 0.0
    assert ida.get_num_lin_solv_setups() > 0
    assert ida.get_num_lin_res_evals() == 0  # AD subsumes the DQ path


def test_get_solution_and_dky_raise_outside_step():
    ida = _ida()
    ida.solve(0.4)
    # legality is one-sided, exactly as C IDAGetDky: t may extrapolate
    # FORWARD of tn, but t behind tn - hused - fuzz is IDA_BAD_T
    with pytest.raises(IdaError) as ei:
        ida.get_solution(-1.0)  # before the last step's window
    assert ei.value.code == C.BAD_T
    with pytest.raises(IdaError) as ei:
        ida.get_dky(0.4, k=int(ida.state.kused) + 1)
    assert ei.value.code == C.BAD_K
    with pytest.raises(IdaError) as ei:
        ida.get_dky(-1.0, k=0)
    assert ei.value.code == C.BAD_T


def test_get_quad_requires_quadratures():
    ida = _ida()
    ida.solve(0.4)
    with pytest.raises(ValueError, match="no quadratures"):
        ida.get_quad()


def test_solve_grid_scan_form_rejects_events():
    from ida_tpu.models import roberts_problem as rp

    ida = IDA(rp(with_roots=True), ROBERTS_YY0, ROBERTS_YP0, TOL())
    with pytest.raises(ValueError, match="cannot record"):
        ida.solve_grid([0.4, 4.0], fused=False, max_events=4)


def test_calc_ic_failure_raises_conv_fail():
    """An unsatisfiable algebraic constraint (y_a^2 + 1 = 0) must surface
    as IdaError(CONV_FAIL) from the stateful wrapper, not a silent bad
    state (C IDACalcIC returns IDA_CONV_FAIL)."""
    from ida_tpu.problem import IdaProblem

    def res(t, y, yp):
        return jnp.stack([yp[0] + y[0], y[1] * y[1] + 1.0])

    prob = IdaProblem(n=2, res=res, id=jnp.asarray([1.0, 0.0]))
    ida = IDA(prob, jnp.asarray([1.0, 0.0]), jnp.asarray([-1.0, 0.0]),
              tol_sv(1e-4, jnp.asarray([1e-6, 1e-6])))
    with pytest.raises(IdaError) as ei:
        ida.calc_ic("ya_ydp", tout1=0.1)
    assert ei.value.code == C.CONV_FAIL


def test_ensemble_convenience_surface():
    """EnsembleIDA: vmapped calc_ic mask, yy/nst properties, status_names,
    and the scan-form events guard."""
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
    from ida_tpu.parallel import EnsembleIDA

    b = 3
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (b, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    # slightly inconsistent yp0 guesses: calc_ic must fix them per-lane
    yp0 = jnp.tile(jnp.asarray([0.0, 0.0, 0.0]), (b, 1))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, TOL())
    ok = ens.calc_ic("ya_ydp", tout1=0.4)
    assert ok.shape == (b,) and ok.all()
    np.testing.assert_allclose(
        np.asarray(ens.states.yp)[:, 0], -0.04, rtol=1e-6
    )
    ens.solve(0.4)
    assert ens.yy.shape == (b, 3)
    assert (ens.nst > 0).all()
    names = ens.status_names(np.zeros(b, np.int32))
    assert names == ["SUCCESS"] * b


def test_problem_post_init_guards():
    """IdaProblem constructor invariants fail loudly (mis-wired hook sets)."""
    from ida_tpu.problem import IdaProblem

    res = lambda t, y, yp: yp - y  # noqa: E731
    with pytest.raises(ValueError, match="root function"):
        IdaProblem(n=1, res=res, nroots=2)
    with pytest.raises(ValueError, match="quad function"):
        IdaProblem(n=1, res=res, nquad=1)
    with pytest.raises(ValueError, match="prec_solve"):
        IdaProblem(n=1, res=res, prec_setup=lambda *a: None)
    with pytest.raises(ValueError, match="jtimes_fn"):
        IdaProblem(n=1, res=res, jtimes_setup=lambda *a: None)


def test_wrms_dispatch_paths():
    """wrms_norm_maybe_masked: the suppressalg dispatch (masked) vs the
    plain path give the reference relationship (mask zeroes components)."""
    from ida_tpu.norms import wrms_norm, wrms_norm_maybe_masked

    x = jnp.asarray([3.0, 4.0])
    w = jnp.asarray([1.0, 1.0])
    mask = jnp.asarray([True, False])
    plain = wrms_norm_maybe_masked(x, w, mask, use_mask=False)
    np.testing.assert_allclose(float(plain), float(wrms_norm(x, w)))
    masked = wrms_norm_maybe_masked(x, w, mask, use_mask=True)
    np.testing.assert_allclose(float(masked), np.sqrt(9.0 / 2.0))
    # use_mask=True with no mask supplied falls back to the plain norm
    nomask = wrms_norm_maybe_masked(x, w, None, use_mask=True)
    np.testing.assert_allclose(float(nomask), float(plain))


def test_ensemble_solve_grid_scan_form_rejects_events():
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
    from ida_tpu.parallel import EnsembleIDA

    b = 2
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (b, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    yp0 = jnp.tile(jnp.asarray(ROBERTS_YP0), (b, 1))
    rooted = lambda p: roberts_factory(p, with_roots=True)  # noqa: E731
    ens = EnsembleIDA(rooted, params, yy0, yp0, TOL())
    with pytest.raises(ValueError, match="cannot record"):
        ens.solve_grid([0.4, 4.0], fused=False, max_events=4)


def test_native_rebuild_and_roots_bench(tmp_path):
    """The lazy source->so build path in native.load(), and the built-in
    rooted Roberts bench denominator (bench.py's serial rooted leg)."""
    import ida_tpu.native as native

    # force the rebuild branch: forget the cached handle and outdate the .so
    native._lib = None
    if native._LIB.exists():
        import os

        os.utime(native._SRC)  # source newer than .so -> rebuild
    lib = native.load()
    assert lib is not None

    total, events = native.oracle_roberts_roots_bench([0.4, 4.0], reps=1)
    assert total > 40
    # idaRoberts first root (y1 = 1e-4) at t ~ 0.264 lies inside the span
    assert len(events) >= 1 and abs(events[0] - 0.264) < 0.01
