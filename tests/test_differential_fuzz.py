"""Differential fuzzing: the JAX engine vs the native C++ oracle over
randomized stiff problems (VERDICT r2 item 7).

The reference's benchmark harness is itself a differential oracle (C
SUNDIALS via sundials-sys vs rust-ida, reference benches/dense.rs); here
``native.oracle_solve`` — built callback-capable precisely for this — runs
every random problem serially while the JAX engine solves the whole seed
batch in ONE vmapped program (one compile per problem family, not per
seed). Any seed where both report success but trajectories diverge beyond
1e-8 relative fails the test, as does any status-code disagreement.

Two problem families, both through the dense-LU Newton path:
* randomized chemistry: Roberts kinetics with the three rate constants
  independently scaled log-uniformly in [0.5, 2] (stiffness ratio ~1e11);
* random stiff linear index-1 DAEs (n = 4): three differential rows
  yp_i + lambda_i * y_i = 0 with lambda log-uniform in [1e-2, 1e3] (five
  decades of stiffness per instance), one algebraic row
  y_3 - sum(c_k y_k) = 0 with random coupling c.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ida_tpu import constants as C
from ida_tpu.core.state import IdaOptions
from ida_tpu.native import oracle_solve
from ida_tpu.parallel import ensemble_init, make_ensemble_solve
from ida_tpu.problem import IdaProblem
from ida_tpu.tol_control import tol_sv, tol_ss

TOUTS = [0.4, 4.0, 40.0, 400.0]


def _close(y_jax, y_orc, rel=1e-8):
    # relative gate on live components; the 1e-10 absolute floor covers
    # components decayed to rounding noise (e^-lam*t underflow) that
    # neither engine's tolerance constrains
    return np.all(np.abs(y_jax - y_orc) <= rel * np.abs(y_orc) + 1e-10)


# ---------- family 1: randomized Roberts chemistry ----------

def test_fuzz_random_chemistry_vs_oracle():
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS

    rng = np.random.default_rng(20260817)
    n_seeds = 24
    scales = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (n_seeds, 3)))
    params = np.asarray(ROBERTS_PARAMS) * scales  # [S, 3]

    yy0 = np.tile([1.0, 0.0, 0.0], (n_seeds, 1))
    yp0 = np.stack([-params[:, 0], params[:, 0], np.zeros(n_seeds)], axis=1)
    atol = np.array([1e-8, 1e-6, 1e-6])
    tol = tol_sv(1e-4, jnp.asarray(atol))

    states = ensemble_init(roberts_factory, jnp.asarray(params), yy0, yp0)
    solve = make_ensemble_solve(roberts_factory, donate=False)

    y_jax = []
    for tout in TOUTS:
        states, tret, istate = solve(states, jnp.asarray(params), tol,
                                     jnp.asarray(tout))
        assert np.all(np.asarray(istate) == C.SUCCESS)
        y_jax.append(np.asarray(states.yy))
    y_jax = np.stack(y_jax, axis=1)  # [S, nout, 3]

    for s in range(n_seeds):
        p1, p2, p3 = params[s]

        def res(t, y, yp, p1=p1, p2=p2, p3=p3):
            r0 = -p1 * y[0] + p2 * y[1] * y[2]
            r1 = -r0 - p3 * y[1] * y[1] - yp[1]
            return np.array([r0 - yp[0], r1, y[0] + y[1] + y[2] - 1.0])

        def jac(t, cj, y, yp, r, p1=p1, p2=p2, p3=p3):
            return np.array(
                [
                    [-p1 - cj, p2 * y[2], p2 * y[1]],
                    [p1, -p2 * y[2] - 2.0 * p3 * y[1] - cj, -p2 * y[1]],
                    [1.0, 1.0, 1.0],
                ]
            )

        ret, y_orc, stats = oracle_solve(
            res, jac, yy0[s], yp0[s], TOUTS, 1e-4, atol
        )
        assert ret == 0, (s, stats)
        assert _close(y_jax[s], y_orc), (
            s, params[s], np.abs(y_jax[s] - y_orc).max()
        )


# ---------- family 2: random stiff linear index-1 DAEs ----------

def _linear_factory(p):
    """p = [lam0, lam1, lam2, c0, c1, c2]: rows 0-2 differential with decay
    rates lam, row 3 algebraic y3 = c . y_{0:3}."""

    def res(t, yy, yp):
        lam = p[0:3]
        c = p[3:6]
        rd = yp[0:3] + lam * yy[0:3]
        ra = yy[3] - (c[0] * yy[0] + c[1] * yy[1] + c[2] * yy[2])
        return jnp.concatenate([rd, ra[None]])

    return IdaProblem(n=4, res=res)


def test_fuzz_random_linear_dae_vs_oracle():
    rng = np.random.default_rng(7)
    n_seeds = 16
    lam = np.exp(rng.uniform(np.log(1e-2), np.log(1e3), (n_seeds, 3)))
    c = rng.uniform(-1.0, 1.0, (n_seeds, 3))
    params = np.concatenate([lam, c], axis=1)  # [S, 6]

    y0d = rng.uniform(0.5, 1.5, (n_seeds, 3))
    y0a = np.sum(c * y0d, axis=1, keepdims=True)
    yy0 = np.concatenate([y0d, y0a], axis=1)
    yp0d = -lam * y0d
    yp0a = np.sum(c * yp0d, axis=1, keepdims=True)
    yp0 = np.concatenate([yp0d, yp0a], axis=1)

    touts = [0.01, 0.1, 1.0, 10.0]
    # tight tolerances: the cross-engine gate below (1e-8) must sit well
    # ABOVE the tolerance-driven divergence of two valid solutions
    tol = tol_ss(1e-9, 1e-13)

    opts = IdaOptions(mxstep=20000)  # rtol 1e-9 on lam ~ 1e3 needs room
    states = ensemble_init(_linear_factory, jnp.asarray(params), yy0, yp0,
                           opts=opts)
    solve = make_ensemble_solve(_linear_factory, opts=opts, donate=False)

    y_jax = []
    for tout in touts:
        states, tret, istate = solve(states, jnp.asarray(params), tol,
                                     jnp.asarray(tout))
        assert np.all(np.asarray(istate) == C.SUCCESS)
        y_jax.append(np.asarray(states.yy))
    y_jax = np.stack(y_jax, axis=1)  # [S, nout, 4]

    for s in range(n_seeds):
        lam_s, c_s = lam[s], c[s]

        def res(t, y, yp, lam=lam_s, c=c_s):
            rd = yp[0:3] + lam * y[0:3]
            ra = y[3] - (c[0] * y[0] + c[1] * y[1] + c[2] * y[2])
            return np.concatenate([rd, [ra]])

        def jac(t, cj, y, yp, r, lam=lam_s, c=c_s):
            J = np.zeros((4, 4))
            for i in range(3):
                J[i, i] = lam[i] + cj
            J[3, 0:3] = -c
            J[3, 3] = 1.0
            return J

        ret, y_orc, stats = oracle_solve(
            res, jac, yy0[s], yp0[s], touts, 1e-9, 1e-13
        )
        assert ret == 0, (s, stats)
        # gate at 1e-7: both engines are within rtol=1e-9 PER STEP, so two
        # valid solutions whose step sequences flip one decision can differ
        # by the accumulated global error (~nst * rtol ~ 1e-6 worst case);
        # measured max across seeds is 3e-8, and a real defect shows up at
        # tolerance scale or larger
        assert _close(y_jax[s], y_orc, rel=1e-7), (
            s, params[s], np.abs(y_jax[s] - y_orc).max()
        )


# ---------- family 3: random explicit initial steps (the reset path) ----------

def test_fuzz_random_hin_vs_oracle():
    """Random explicit initial steps spanning 6 orders — the large end makes
    the FIRST attempt fail at nst == 0, exercising the reset path (psi[0] =
    hh, phi[1] *= rr; C IDAReset semantics — the reference's whole-phi
    scaling bug, SURVEY §2.4, would fail these seeds with ERR_FAIL at
    t = 0). Both engines take the same hin, so trajectories must still
    agree to 1e-8 where both succeed."""
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS

    rng = np.random.default_rng(31415)
    n_seeds = 16
    scales = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (n_seeds, 3)))
    params = np.asarray(ROBERTS_PARAMS) * scales
    hins = np.exp(rng.uniform(np.log(1e-6), np.log(1.0), n_seeds))
    # pin the reset regime: make the largest-hin seed deterministic
    hins[0] = 1.0

    yy0 = np.tile([1.0, 0.0, 0.0], (n_seeds, 1))
    yp0 = np.stack([-params[:, 0], params[:, 0], np.zeros(n_seeds)], axis=1)
    atol = np.array([1e-8, 1e-6, 1e-6])
    tol = tol_sv(1e-4, jnp.asarray(atol))
    touts = [0.4, 4.0, 40.0]

    states = ensemble_init(roberts_factory, jnp.asarray(params), yy0, yp0)
    states = states._replace(hin=jnp.asarray(hins))
    solve = make_ensemble_solve(roberts_factory, donate=False)

    y_jax = []
    for tout in touts:
        states, tret, istate = solve(states, jnp.asarray(params), tol,
                                     jnp.asarray(tout))
        assert np.all(np.asarray(istate) == C.SUCCESS)
        y_jax.append(np.asarray(states.yy))
    y_jax = np.stack(y_jax, axis=1)  # [S, nout, 3]
    # the reset path actually fired somewhere in the batch
    assert np.asarray(states.ncfn).sum() >= 1

    for s in range(n_seeds):
        p1, p2, p3 = params[s]

        def res(t, y, yp, p1=p1, p2=p2, p3=p3):
            r0 = -p1 * y[0] + p2 * y[1] * y[2]
            r1 = -r0 - p3 * y[1] * y[1] - yp[1]
            return np.array([r0 - yp[0], r1, y[0] + y[1] + y[2] - 1.0])

        def jac(t, cj, y, yp, r, p1=p1, p2=p2, p3=p3):
            return np.array(
                [
                    [-p1 - cj, p2 * y[2], p2 * y[1]],
                    [p1, -p2 * y[2] - 2.0 * p3 * y[1] - cj, -p2 * y[1]],
                    [1.0, 1.0, 1.0],
                ]
            )

        ret, y_orc, stats = oracle_solve(
            res, jac, yy0[s], yp0[s], touts, 1e-4, atol, hin=float(hins[s])
        )
        assert ret == 0, (s, stats)
        assert _close(y_jax[s], y_orc), (
            s, float(hins[s]), np.abs(y_jax[s] - y_orc).max()
        )
