"""SPGMR Krylov path: standalone GMRES correctness + Heat2D end-to-end,
cross-checked against the dense path (BASELINE.md config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaOptions, IdaSolveStatus
from ida_tpu.models.heat2d import heat2d_problem, heat2d_ic
from ida_tpu.ops.spgmr import spgmr_solve
from ida_tpu.tol_control import tol_ss


def test_spgmr_standalone():
    # well-conditioned SPD-ish system, matrix-free
    rng = np.random.default_rng(0)
    n = 40
    a = np.eye(n) * 4.0 + rng.normal(size=(n, n)) * 0.2
    x_true = rng.normal(size=n)
    b = a @ x_true
    aj = jnp.asarray(a)

    res = spgmr_solve(lambda v: aj @ v, jnp.asarray(b), jnp.asarray(1e-10),
                      maxl=20, max_restarts=20)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-9)


def test_spgmr_scaled_preconditioned():
    rng = np.random.default_rng(1)
    n = 30
    d = np.abs(rng.normal(size=n)) + 1.0
    a = np.diag(d) + rng.normal(size=(n, n)) * 0.05
    x_true = rng.normal(size=n)
    b = a @ x_true
    aj = jnp.asarray(a)
    w = jnp.asarray(1.0 / (np.abs(x_true) + 1.0))

    res = spgmr_solve(
        lambda v: aj @ v,
        jnp.asarray(b),
        jnp.asarray(1e-10),
        psolve=lambda r: r / jnp.asarray(d),
        s1=w,
        s2=w,
        maxl=15,
        max_restarts=10,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6, atol=1e-8)
    assert int(res.nps) > 0


def _solve_heat2d(m, linear_solver, touts):
    prob = heat2d_problem(m, use_prec=(linear_solver == "spgmr"))
    u0, up0 = heat2d_ic(m)
    opts = IdaOptions(linear_solver=linear_solver, mxstep=5000)
    ida = IDA(prob, u0, up0, tol_ss(1e-5, 1e-8), options=opts)
    out = []
    for t in touts:
        tret, status = ida.solve(t)
        assert status == IdaSolveStatus.Success
        out.append(ida.get_yy().copy())
    return ida, out


def test_heat2d_spgmr_vs_dense():
    m = 10
    touts = [0.01, 0.04, 0.16]
    ida_d, dense_out = _solve_heat2d(m, "dense", touts)
    ida_k, kry_out = _solve_heat2d(m, "spgmr", touts)
    for ud, uk in zip(dense_out, kry_out):
        np.testing.assert_allclose(uk, ud, atol=5e-6)
    assert ida_k.get_num_lin_iters() > 0
    assert ida_k.get_num_prec_solves() > 0
    assert ida_k.get_num_jac_evals() == 0  # fully matrix-free

    # physics: fundamental mode decays ~ exp(-2 pi^2 t); max at t=0.01 from
    # the C idaHeat2D_kry output is ~0.8 for m=10 grids
    u = dense_out[0].reshape(m, m)
    assert 0.5 < u.max() < 1.0
    assert dense_out[2].max() < dense_out[0].max()
