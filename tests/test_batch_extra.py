"""Ensemble edge paths: rootfinding under vmap, SPGMR+preconditioner under
vmap (pdata pytree in the batched carry)."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import constants as C
from ida_tpu.core.state import IdaOptions
from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
from ida_tpu.parallel import EnsembleIDA
from ida_tpu.tol_control import tol_sv, tol_ss


def test_ensemble_rootfinding():
    # every lane must stop at its own first root (y3 = 0.01); different
    # chemistry -> different root times, all in lockstep
    b = 4
    scale = np.linspace(0.9, 1.1, b)
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))

    ens = EnsembleIDA(
        lambda p: roberts_factory(p, with_roots=True), params, yy0, yp0, tol
    )
    tret, istate = ens.solve(0.4)
    assert np.all(istate == C.ROOT_RETURN), ens.status_names(istate)
    # root times bracket the nominal 0.264 and vary monotonically with k1
    assert np.all((tret > 0.1) & (tret < 0.4))
    assert len(set(np.round(tret, 6))) == b
    # iroots: y3 crossing upward
    np.testing.assert_array_equal(np.asarray(ens.states.iroots)[:, 1], 1)

    # continuing past the root reaches tout
    tret2, istate2 = ens.solve(0.4)
    assert np.all(istate2 == C.SUCCESS)
    np.testing.assert_allclose(tret2, 0.4)


def test_ensemble_spgmr_heat2d():
    # small heat2d ensemble with per-lane diffusion scaling: exercises the
    # preconditioner pdata pytree inside the vmapped carry
    from ida_tpu.models.heat2d import heat2d_ic
    from ida_tpu.problem import IdaProblem

    m = 6
    n = m * m
    interior = np.zeros((m, m), bool)
    interior[1:-1, 1:-1] = True
    interior_flat = jnp.asarray(interior.reshape(-1))
    dx = 1.0 / (m - 1)
    coeff = 1.0 / (dx * dx)

    def factory(kappa):
        def lap(u):
            u2 = u.reshape(m, m)
            out = (
                jnp.roll(u2, 1, 0) + jnp.roll(u2, -1, 0)
                + jnp.roll(u2, 1, 1) + jnp.roll(u2, -1, 1) - 4.0 * u2
            ) * coeff
            return out.reshape(-1)

        def res(t, yy, yp):
            return jnp.where(interior_flat, yp - kappa * lap(yy), yy)

        def prec_setup(t, cj, yy, yp, rr):
            diag = jnp.where(interior_flat, cj + 4.0 * kappa * coeff, 1.0)
            return (1.0 / diag,)

        return IdaProblem(
            n=n, res=res, id=interior_flat,
            prec_setup=prec_setup,
            prec_solve=lambda pd, r, cj: pd[0] * r,
            prec_zero=lambda: (jnp.zeros(n, jnp.float64),),
        )

    b = 3
    kappas = jnp.asarray([0.5, 1.0, 2.0])
    u0, up0 = heat2d_ic(m)
    yy0 = jnp.tile(jnp.asarray(u0), (b, 1))
    yp0 = kappas[:, None] * jnp.asarray(up0)

    opts = IdaOptions(linear_solver="spgmr", mxstep=2000)
    ens = EnsembleIDA(factory, kappas, yy0, yp0, tol_ss(1e-5, 1e-8), options=opts)
    tret, istate = ens.solve(0.05)
    assert np.all(istate == C.SUCCESS), ens.status_names(istate)
    # higher diffusion decays faster
    maxes = np.asarray(ens.states.yy).max(axis=1)
    assert maxes[0] > maxes[1] > maxes[2]


def test_stratified_solve_matches_plain():
    """Stratified (sorted sub-batch) solve returns lanes in original order
    with bit-identical results to the plain lockstep ensemble."""
    import numpy as np
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
    from ida_tpu.parallel import ensemble_init, make_ensemble_solve
    from ida_tpu.parallel.batch import make_stratified_solve, pilot_cost
    from ida_tpu.tol_control import tol_sv

    B = 8
    scale = np.logspace(-0.5, 0.5, B)
    rng = np.random.default_rng(0)
    scale = scale[rng.permutation(B)]  # unsorted costs
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    tol = tol_sv(1e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))
    opts = IdaOptions()
    states = ensemble_init(roberts_factory, params, yy0, yp0, opts=opts)

    key = pilot_cost(roberts_factory, states, params, tol, 0.4, opts)
    assert np.asarray(key).min() > 0

    strat = make_stratified_solve(roberts_factory, opts, n_chunks=2)
    st_s, tret_s, ist_s = strat(states, params, tol, 400.0, key)

    plain = make_ensemble_solve(roberts_factory, opts, donate=False)
    st_p, tret_p, ist_p = plain(states, params, tol, jnp.asarray(400.0))

    assert np.array_equal(np.asarray(ist_s), np.asarray(ist_p))
    assert np.array_equal(np.asarray(st_s.yy), np.asarray(st_p.yy))
    assert np.array_equal(np.asarray(st_s.nst), np.asarray(st_p.nst))


def test_ensemble_mesh_auto_sharding():
    """EnsembleIDA(mesh=...) splits lanes over the device mesh (dp) and
    solves to the same per-lane results as the unsharded ensemble."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from ida_tpu.parallel import EnsembleIDA, make_mesh
    from ida_tpu.models.roberts import ROBERTS_PARAMS, ROBERTS_YY0, roberts_factory
    from ida_tpu.tol_control import tol_sv
    from ida_tpu import constants as C

    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest provisions 8 virtual CPU devices"
    B = 2 * n_dev
    scale = np.exp(np.linspace(-0.1, 0.1, B))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (B, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0])
    tol = tol_sv(1.0e-4, jnp.asarray([1e-8, 1e-6, 1e-6]))

    mesh = make_mesh()
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, tol, mesh=mesh)
    assert len(ens.states.phi.sharding.device_set) == n_dev
    tret, ist = ens.solve(0.4)
    assert np.all(ist == C.SUCCESS)

    ref = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    tret_r, ist_r = ref.solve(0.4)
    np.testing.assert_array_equal(ist, ist_r)
    np.testing.assert_allclose(
        np.asarray(ens.states.yy), np.asarray(ref.states.yy), rtol=1e-12
    )
