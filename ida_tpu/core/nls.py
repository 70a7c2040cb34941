"""Nonlinear system solution for one step attempt (L3 layer).

Behavioural spec:
* driver & lsetup decision: reference ``nonlinear_solve`` (src/lib.rs:787-890)
* Newton iteration with deferred Jacobian: reference
  ``crates/nonlinear/src/newton.rs:51-167``
* IDA-specific sys/setup/solve/ctest: reference ``src/ida_nls.rs:105-266``
  and ``src/ida_ls.rs:232-455``

TPU-first design: the reference's outer(retry)/inner(iterate) Rust loops with
``Result`` early exits become two nested masked ``while_loop`` state machines
over a flat carry; every lane of a vmapped ensemble runs its own iteration
count in lockstep. The linear solve is the batched LU from ``ops.dense_lu``;
the Jacobian comes from the problem (analytic or one ``jacfwd``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..norms import wrms_norm
from ..ops import lu_factor, lu_solve
from ..problem import IdaProblem
from ..utils import masked_while_loop, tree_where
from .state import IdaState, IdaOptions

# internal Newton loop status
_CONTINUE = 0
_OK = 1
_CONV_RECVR = 2  # recoverable: retry with fresh Jacobian or fail the attempt
_LSETUP_RECVR = 3  # singular Jacobian in lsetup


class _Inner(NamedTuple):
    state: IdaState
    ycor: jax.Array  # current correction iterate
    delta: jax.Array  # residual F at the current iterate
    curiter: jax.Array  # int32 m
    istatus: jax.Array  # int32


class _Outer(NamedTuple):
    state: IdaState
    ycor: jax.Array
    call_lsetup: jax.Array  # bool
    jcur: jax.Array  # bool: Jacobian current
    ostatus: jax.Array  # int32


def _sys(state: IdaState, problem: IdaProblem, ycor: jax.Array) -> Tuple[IdaState, jax.Array]:
    """idaNlsResidual (reference src/ida_nls.rs:118-153): update yy/yp from
    the correction and evaluate the residual."""
    yy = state.yypredict + ycor
    yp = state.yppredict + state.cj * ycor
    r = problem.res(state.tn, yy, yp)
    state = state._replace(yy=yy, yp=yp, savres=r, nre=state.nre + 1)
    return state, r


def _lsetup(
    state: IdaState, problem: IdaProblem, opts: IdaOptions
) -> Tuple[IdaState, jax.Array]:
    """idaNlsLSetup + idaLsSetup (reference src/ida_nls.rs:156-187,
    src/ida_ls.rs:232-290). Dense: evaluate J = dF/dy + cj*dF/dy' at the
    predictor and LU-factor it. SPGMR: refresh the preconditioner (the
    operator itself is matrix-free via jvp, always current). Both refresh
    the cj convergence constants."""
    if opts.linear_solver == "dense":
        j = problem.sys_jacobian(state.tn, state.cj, state.yy, state.yp, state.savres)
        f = lu_factor(j)
        state = state._replace(lu=f.lu, piv=f.piv, nje=state.nje + 1)
        fail = f.fail_col > 0
    else:
        if problem.prec_setup is not None:
            pdata = problem.prec_setup(
                state.tn, state.cj, state.yy, state.yp, state.savres
            )
            state = state._replace(pdata=pdata)
        fail = jnp.asarray(False)
    state = state._replace(
        nsetups=state.nsetups + 1,
        cjold=state.cj,
        cjratio=jnp.ones((), state.dtype),
        ss=jnp.asarray(20.0, state.dtype),
    )
    return state, fail


def _lsolve(
    state: IdaState, problem: IdaProblem, opts: IdaOptions, b: jax.Array
) -> Tuple[IdaState, jax.Array, jax.Array]:
    """idaLsSolve (reference src/ida_ls.rs:298-455). Returns (state, x, ok).

    Dense path: permuted triangular solves + the cj-change correction
    2/(1 + cjratio). SPGMR path: matrix-free GMRES with ewt scaling and
    tol = sqrt(N) * eplifac * eps_newt (C idaLsSolve); no cj correction
    (pure-iterative semantics, reference src/ida_ls.rs:406-410)."""
    if opts.linear_solver == "dense":
        from ..ops.dense_lu import DenseLU

        x = lu_solve(DenseLU(state.lu, state.piv, jnp.zeros((), jnp.int32)), b)
        scale = jnp.where(
            state.cjratio != 1.0, 2.0 / (1.0 + state.cjratio), jnp.ones((), state.dtype)
        )
        return state, x * scale, jnp.asarray(True)

    from ..ops.spgmr import spgmr_solve

    t, cj, yy, yp = state.tn, state.cj, state.yy, state.yp
    atimes = lambda v: problem.jtimes(t, cj, yy, yp, v)  # noqa: E731
    psolve = None
    if problem.prec_solve is not None:
        pdata = state.pdata
        psolve = lambda r: problem.prec_solve(pdata, r, cj)  # noqa: E731
    sqrt_n = jnp.sqrt(jnp.asarray(problem.n, state.dtype))
    tol = sqrt_n * opts.eplifac * state.eps_newt
    res = spgmr_solve(
        atimes,
        b,
        tol,
        psolve=psolve,
        s1=state.ewt,
        s2=state.ewt,
        maxl=opts.krylov_maxl,
        max_restarts=opts.krylov_max_restarts,
    )
    state = state._replace(
        nli=state.nli + res.nli, nps=state.nps + res.nps
    )
    return state, res.x, res.converged


def _newton_iterate(
    state: IdaState, problem: IdaProblem, opts: IdaOptions, delta0: jax.Array
) -> Tuple[IdaState, jax.Array, jax.Array]:
    """The inner Newton loop (reference newton.rs:96-135 + idaNlsConvTest
    src/ida_nls.rs:218-266). Starts from ycor = 0 with residual ``delta0``.
    Returns (state, ycor, istatus)."""

    def cond(c: _Inner) -> jax.Array:
        return c.istatus == _CONTINUE

    def body(c: _Inner) -> _Inner:
        st = c.state
        st = st._replace(nni=st.nni + 1)

        st, x, lok = _lsolve(st, problem, opts, -c.delta)
        ycor = c.ycor + x

        # --- convergence test (idaNlsConvTest) ---
        delnrm = wrms_norm(x, st.ewt)
        m = c.curiter
        first = m == 0
        oldnrm = jnp.where(first, delnrm, st.oldnrm)
        conv_direct = jnp.logical_and(first, delnrm <= 1.0e-4 * st.toldel)
        # rate estimate for m > 0
        rate = jnp.where(
            first, jnp.zeros((), st.dtype), (delnrm / oldnrm) ** (1.0 / jnp.maximum(m, 1))
        )
        diverged = jnp.logical_and(jnp.logical_not(first), rate > C.RATEMAX)
        ss = jnp.where(jnp.logical_not(first), rate / (1.0 - rate), st.ss)
        converged = jnp.logical_or(conv_direct, ss * delnrm <= st.eps_newt)
        st = st._replace(oldnrm=oldnrm, ss=ss)

        curiter = m + 1
        exhausted = curiter >= opts.maxnlsit

        istatus = jnp.where(
            diverged,
            _CONV_RECVR,
            jnp.where(converged, _OK, jnp.where(exhausted, _CONV_RECVR, _CONTINUE)),
        ).astype(jnp.int32)
        # a failed linear solve (Krylov non-convergence) is a recoverable
        # failure of the attempt (C IDA_LSOLVE_RECVR)
        istatus = jnp.where(lok, istatus, jnp.asarray(_CONV_RECVR, jnp.int32))

        # re-evaluate the residual only if iterating again
        st2, delta = _sys(st, problem, ycor)
        keep_going = istatus == _CONTINUE
        st = tree_where(keep_going, st2, st)
        delta = jnp.where(keep_going, delta, c.delta)

        return _Inner(state=st, ycor=ycor, delta=delta, curiter=curiter, istatus=istatus)

    init = _Inner(
        state=state,
        ycor=jnp.zeros_like(state.yy),
        delta=delta0,
        curiter=jnp.zeros((), jnp.int32),
        istatus=jnp.zeros((), jnp.int32),
    )
    out = masked_while_loop(cond, body, init)
    return out.state, out.ycor, out.istatus


def nonlinear_solve(
    state: IdaState, problem: IdaProblem, opts: IdaOptions
) -> Tuple[IdaState, jax.Array]:
    """Attempt the nonlinear solve for the current step (reference
    src/lib.rs:787-890). Returns (state, nl_status) with nl_status in
    {REC_NONE (ok), REC_CONV, REC_LSETUP, REC_CONSTRAINT}. On success
    state.ee/yy/yp hold the accepted correction."""
    dtype = state.dtype

    # first-call initialisation (src/lib.rs:794-799)
    first = state.nst == 0
    state = state._replace(
        cjold=jnp.where(first, state.cj, state.cjold),
        ss=jnp.where(first, jnp.asarray(20.0, dtype), state.ss),
    )
    call_lsetup = first

    # lsetup decision from the cj ratio (src/lib.rs:804-812)
    cjratio = state.cj / state.cjold
    lo = (1.0 - C.XRATE) / (1.0 + C.XRATE)
    call_lsetup = jnp.logical_or(
        call_lsetup, jnp.logical_or(cjratio < lo, cjratio > 1.0 / lo)
    )
    ss = jnp.where(state.cj != state.cjlast, jnp.asarray(100.0, dtype), state.ss)
    state = state._replace(cjratio=cjratio, ss=ss)

    # --- outer loop: residual -> (lsetup?) -> Newton; one retry with a fresh
    # Jacobian on a recoverable convergence failure (newton.rs:73-160) ---
    def cond(c: _Outer) -> jax.Array:
        return c.ostatus == _CONTINUE

    def body(c: _Outer) -> _Outer:
        st = c.state
        # residual at the predictor (ycor = 0)
        st, delta = _sys(st, problem, jnp.zeros_like(st.yy))

        # linear setup if requested
        def do_setup(s):
            s2, fail = _lsetup(s, problem, opts)
            return s2, fail

        st2, setup_fail = do_setup(st)
        st = tree_where(c.call_lsetup, st2, st)
        setup_fail = jnp.logical_and(c.call_lsetup, setup_fail)
        jcur = jnp.logical_or(c.jcur, c.call_lsetup)

        # Newton iteration
        st_it, ycor, istatus = _newton_iterate(st, problem, opts, delta)
        st = tree_where(jnp.logical_not(setup_fail), st_it, st)
        ycor = jnp.where(setup_fail, c.ycor, ycor)

        retry = jnp.logical_and(istatus == _CONV_RECVR, jnp.logical_not(jcur))
        retry = jnp.logical_and(retry, jnp.logical_not(setup_fail))

        ostatus = jnp.where(
            setup_fail,
            _LSETUP_RECVR,
            jnp.where(
                retry,
                _CONTINUE,
                jnp.where(istatus == _OK, _OK, _CONV_RECVR),
            ),
        ).astype(jnp.int32)

        return _Outer(
            state=st,
            ycor=ycor,
            call_lsetup=retry,  # retry pass forces a fresh Jacobian
            jcur=jnp.where(istatus == _OK, False, jcur),
            ostatus=ostatus,
        )

    init = _Outer(
        state=state,
        ycor=jnp.zeros_like(state.yy),
        call_lsetup=call_lsetup,
        jcur=jnp.asarray(False),
        ostatus=jnp.zeros((), jnp.int32),
    )
    out = masked_while_loop(cond, body, init)
    state, ycor = out.state, out.ycor

    # apply the final correction (src/lib.rs:845-849); done unconditionally
    # like the reference (values are only *used* on success)
    ee = ycor
    yy = state.yypredict + ee
    yp = state.yppredict + state.cj * ee
    state = state._replace(ee=ee, yy=yy, yp=yp)

    nl_status = jnp.where(
        out.ostatus == _OK,
        C.REC_NONE,
        jnp.where(out.ostatus == _LSETUP_RECVR, C.REC_LSETUP, C.REC_CONV),
    ).astype(jnp.int32)

    # --- inequality constraints (C IDA IDANls; the reference leaves this
    # branch unimplemented!() with the C spec in comments, src/lib.rs:857-887)
    # constraint codes: 2 => y>0, 1 => y>=0, -1 => y<=0, -2 => y<0, 0 = none
    cvec = state.constraints
    viol = jnp.where(
        cvec == 2.0, yy <= 0.0,
        jnp.where(cvec == 1.0, yy < 0.0,
                  jnp.where(cvec == -1.0, yy > 0.0,
                            jnp.where(cvec == -2.0, yy >= 0.0, False))),
    )
    check = jnp.logical_and(state.constraints_set, nl_status == C.REC_NONE)
    failed = jnp.logical_and(check, jnp.any(viol))

    mm = viol.astype(dtype)
    strict = (jnp.abs(cvec) >= 1.5).astype(dtype)  # N_VCompare(1.5, |c|)
    v = mm * (yy - 0.1 * strict * cvec / state.ewt)  # mm*(y - 0.1*a*c*wt)
    vnorm = wrms_norm(v, state.ewt)
    small = vnorm <= state.eps_newt

    # small violation: pull the correction back inside (ee only — phi gets
    # rebuilt from ee in complete_step; yy/yp are scratch past this point)
    ee_fixed = jnp.where(jnp.logical_and(failed, small), ee - v, ee)

    # large violation: shrink h by rr = max(0.9*minquotient(phi[0], mm*(phi0-y)), 0.1)
    denom = mm * (state.phi[0] - yy)
    quot = jnp.where(denom != 0.0, state.phi[0] / denom, jnp.inf)
    minq = jnp.min(quot)
    rr_c = jnp.maximum(0.9 * minq, 0.1)
    constr_recvr = jnp.logical_and(failed, jnp.logical_not(small))

    state = state._replace(
        ee=ee_fixed,
        rr=jnp.where(constr_recvr, rr_c, state.rr),
    )
    nl_status = jnp.where(constr_recvr, C.REC_CONSTRAINT, nl_status).astype(jnp.int32)
    return state, nl_status
