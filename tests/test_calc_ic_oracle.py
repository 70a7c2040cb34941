"""Differential calc_ic: JAX vs the native C++ IDACalcIC (VERDICT r3 item 7).

The native oracle's CalcIC mirrors C ida_ic.c structurally (mxnh hic
retries, frozen-J maxnj refreshes, halving linesearch bounded by the
steptol rule steptol = uround^(2/3)); the JAX implementation uses the
EXACT AD Jacobian of the IC system instead of C's standard-system
approximation, so iteration COUNTS differ (the AD form usually needs
fewer) while the consistent IC itself — the locally unique root of
F(t0, ., .) = 0 under the icopt pinning — must agree to the Newton
tolerance. Both sides also satisfy the residual directly.
"""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA
from ida_tpu.models import roberts_problem
from ida_tpu.native import oracle_calc_ic
from ida_tpu.tol_control import tol_sv

RTOL, ATOL = 1.0e-4, np.array([1e-8, 1e-6, 1e-6])


def _np_res(t, y, yp):
    r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
    return np.array(
        [r0 - yp[0], -r0 - 3.0e7 * y[1] ** 2 - yp[1],
         y[0] + y[1] + y[2] - 1.0]
    )


def _np_jac(t, cj, y, yp, r):
    return np.array(
        [
            [-0.04 - cj, 1.0e4 * y[2], 1.0e4 * y[1]],
            [0.04, -1.0e4 * y[2] - 6.0e7 * y[1] - cj, -1.0e4 * y[1]],
            [1.0, 1.0, 1.0],
        ]
    )


def _jax_calc_ic(yy0, yp0, icopt, tout1=0.4):
    ida = IDA(roberts_problem(with_roots=False), jnp.asarray(yy0),
              jnp.asarray(yp0), tol_sv(RTOL, jnp.asarray(ATOL)))
    ida.calc_ic(icopt, tout1=tout1)
    return ida.get_consistent_ic()


def test_ya_ydp_matches_native_oracle():
    """Perturbed Roberts (y2 violates the algebraic constraint, yp wrong):
    both engines must land on the same consistent (y2, yp0, yp1)."""
    yy0 = np.array([0.7, 0.1, 0.5])
    yp0 = np.array([0.0, 0.0, 0.0])
    id_mask = np.array([1.0, 1.0, 0.0])

    ret, yo, ypo, stats = oracle_calc_ic(
        _np_res, _np_jac, yy0, yp0, 0.4, RTOL, ATOL, icopt=1, id_mask=id_mask
    )
    assert ret == 0, stats
    # the oracle stops at C's epiccon = 0.01*EPCON weighted-step criterion
    # (ida_ic.c IDANewtonIC), so consistency holds RELATIVE to each
    # equation's magnitude (eq 1 has scale 3e7*y1^2 ~ 3e5), not in the raw
    # residual
    res_o = _np_res(0.0, yo, ypo)
    assert np.max(np.abs(res_o) / np.maximum(1.0, np.abs(ypo))) < 1e-4
    # closed form: algebraic y2 from the conservation row; differential y
    # pinned at the inputs (epiccon-level accuracy on the solved unknowns)
    np.testing.assert_allclose(yo[:2], yy0[:2], rtol=0, atol=0)
    np.testing.assert_allclose(yo[2], 0.2, rtol=1e-5)
    np.testing.assert_allclose(ypo[0], -0.04 * 0.7 + 1e4 * 0.1 * 0.2,
                               rtol=1e-5)

    yj, ypj = _jax_calc_ic(yy0, yp0, "ya_ydp")
    # both are epiccon-accurate roots of the same IC system; the JAX side
    # (exact AD Jacobian) typically lands tighter, so agreement is bounded
    # by the looser engine's Newton tolerance
    np.testing.assert_allclose(np.asarray(yj), yo, rtol=1e-5, atol=1e-12)
    # yp2 is not an unknown under YA_YDP (id=0 there): both engines must
    # leave it at the input value
    np.testing.assert_allclose(np.asarray(ypj)[:2], ypo[:2], rtol=1e-5)
    assert float(ypj[2]) == ypo[2] == 0.0
    # effort: on this strongly perturbed IC the frozen-J standard-system
    # scheme grinds (measured nni=159, nje=16 — the cj=1/hic Jacobian is a
    # poor IC-system approximation far from the root, exactly C's behavior),
    # while the JAX exact-AD Newton converges in single digits; only the
    # structural caps (mxnh*maxnj*maxnit, mxnh*maxnj) bound the oracle
    assert stats["nni"] <= 200 and stats["nje"] <= 20


def test_y_init_matches_native_oracle():
    """Y_INIT: recover all of y given y' — same nontrivial root
    (y1 = sqrt(0.01/3e7)) from both engines."""
    yy0 = np.array([1.0, 1e-5, 0.05])
    yp0 = np.array([-0.05, 0.04, 0.0])

    ret, yo, ypo, stats = oracle_calc_ic(
        _np_res, _np_jac, yy0, yp0, 0.4, RTOL, ATOL, icopt=2
    )
    assert ret == 0, stats
    assert np.max(np.abs(_np_res(0.0, yo, ypo))) < 1e-6
    np.testing.assert_allclose(yo[1], np.sqrt(0.01 / 3e7), rtol=1e-4)
    np.testing.assert_allclose(ypo, yp0, rtol=0, atol=0)  # y' untouched

    yj, _ = _jax_calc_ic(yy0, yp0, "y")
    np.testing.assert_allclose(np.asarray(yj), yo, rtol=1e-6, atol=1e-10)


def test_ya_ydp_oracle_agrees_through_integration():
    """End-to-end: oracle-corrected ICs fed to the JAX solver integrate to
    the same state as the JAX-corrected ICs (the ICs are interchangeable)."""
    yy0 = np.array([1.0, 0.0, 0.3])
    yp0 = np.array([0.0, 0.0, 0.0])
    id_mask = np.array([1.0, 1.0, 0.0])
    ret, yo, ypo, _ = oracle_calc_ic(
        _np_res, _np_jac, yy0, yp0, 0.4, RTOL, ATOL, icopt=1, id_mask=id_mask
    )
    assert ret == 0

    ida_o = IDA(roberts_problem(with_roots=False), jnp.asarray(yo),
                jnp.asarray(ypo), tol_sv(RTOL, jnp.asarray(ATOL)))
    ida_o.solve(0.4)

    ida_j = IDA(roberts_problem(with_roots=False), jnp.asarray(yy0),
                jnp.asarray(yp0), tol_sv(RTOL, jnp.asarray(ATOL)))
    ida_j.calc_ic("ya_ydp", tout1=0.4)
    ida_j.solve(0.4)

    np.testing.assert_allclose(
        np.asarray(ida_o.get_yy()), np.asarray(ida_j.get_yy()), rtol=1e-4
    )


def test_foodweb_ya_ydp_matches_native_oracle():
    """Foodweb (VERDICT r3 item 7 named this case): algebraic predators
    start on a flat 1e5 guess; both engines must pull them onto the
    c_pred ~ EE*c_prey manifold and agree to the Newton tolerance. The
    oracle's callbacks are built from the SAME JAX residual (jacfwd for
    J = dF/dy + cj dF/dyp), so this isolates exactly the calc_ic
    ALGORITHM difference (frozen-J standard-system scheme vs exact-AD
    Newton on the IC system)."""
    import jax
    import jax.numpy as jnp

    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models.foodweb import EE, foodweb_ic, foodweb_problem
    from ida_tpu.tol_control import tol_ss

    mx = my = 4
    prob = foodweb_problem(mx, my, use_prec=False)
    c0, cp0 = foodweb_ic(mx, my)
    n = c0.shape[0]
    id_mask = np.asarray(prob.id, np.float64)

    def np_res(t, y, yp):
        return np.asarray(prob.res(t, jnp.asarray(y), jnp.asarray(yp)))

    @jax.jit
    def _jac(cj, y, yp):
        Jy = jax.jacfwd(lambda v: prob.res(0.0, v, yp))(y)
        Jyp = jax.jacfwd(lambda v: prob.res(0.0, y, v))(yp)
        return Jy + cj * Jyp

    def np_jac(t, cj, y, yp, r):
        return np.asarray(_jac(cj, jnp.asarray(y), jnp.asarray(yp)))

    ret, yo, ypo, stats = oracle_calc_ic(
        np_res, np_jac, c0, cp0, 1e-3, 1e-5, np.full(n, 1e-5), icopt=1,
        id_mask=id_mask,
    )
    assert ret == 0, stats
    co = yo.reshape(mx, my, 2)
    np.testing.assert_allclose(co[..., 1] / (EE * co[..., 0]), 1.0, rtol=1e-3)

    from ida_tpu import IDA

    opts = IdaOptions(linear_solver="spgmr")
    ida = IDA(prob, jnp.asarray(c0), jnp.asarray(cp0), tol_ss(1e-5, 1e-5),
              options=opts)
    ida.calc_ic("ya_ydp", tout1=1e-3)
    yj, ypj = ida.get_consistent_ic()
    # predators (the solved unknowns in y): agree to Newton tolerance;
    # prey and untouched yp rows: exactly the inputs on both sides
    np.testing.assert_allclose(np.asarray(yj), yo, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        yo.reshape(-1)[id_mask == 1.0], c0[id_mask == 1.0], rtol=0, atol=0
    )
    # solved differential yp rows agree in the ewt metric (scale ~ EE*prey)
    dyp = np.abs(np.asarray(ypj) - ypo) / (1e-5 * np.abs(ypo) + 1e-5 + 1.0)
    assert float(dyp.max()) < 2e-2, float(dyp.max())
