"""Bisect harness for the fused whole-solve Pallas kernel (PERF.md).

Compiles ONE solver stage inside a Pallas TPU kernel (synthetic but
structurally-real state; compile-only — Mosaic failures happen at compile
time) and reports OK / the Mosaic error. Use on the chip to localize
layout/relayout failures stage by stage:

    python scripts/bisect_fused.py error_test
    python scripts/bisect_fused.py complete_step attempt solve
    python scripts/bisect_fused.py all --tile 256

Round-1 status (PERF.md "Mosaic compile status"): set_coeffs+predict,
restore, tree_where, lsetup, and the unrolled-Newton stage compile AND run;
error_test and complete_step fail with an invalid {row-offset}->{replicated}
relayout; dynamic whiles fail layout inference in some compositions.
"""

from __future__ import annotations

import argparse
import sys
import threading
import traceback

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def build_stage(stage: str, tile: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ida_tpu.core.state import IdaOptions, init_state
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
    from ida_tpu.ops.fused_solve import _template, _pack_tail, _unpack_tail, _to_kernel_dtypes
    from ida_tpu.tol_control import tol_sv

    dtype = jnp.float32
    b = tile
    opts = IdaOptions(unroll_newton=True)
    params_b = jnp.tile(jnp.asarray(ROBERTS_PARAMS, dtype), (b, 1))
    prob1 = roberts_factory(jnp.asarray(ROBERTS_PARAMS, dtype))
    st1 = init_state(prob1, jnp.asarray([1.0, 0.0, 0.0], dtype),
                     jnp.asarray([-0.04, 0.04, 0.0], dtype), dtype=dtype, opts=opts)
    st1 = _to_kernel_dtypes(st1)
    # prime mid-flight-looking scalars so every stage is structurally real
    st1 = st1._replace(
        hh=jnp.asarray(1e-4, dtype), kk=jnp.asarray(2, jnp.int32),
        kused=jnp.asarray(2, jnp.int32), ns=jnp.asarray(1, jnp.int32),
        nst=jnp.asarray(3, jnp.int32),
        cj=jnp.asarray(1e4, dtype), cjold=jnp.asarray(1e4, dtype),
        cjlast=jnp.asarray(1e4, dtype),
        psi=jnp.asarray([1e-4, 2e-4, 3e-4, 0, 0, 0], dtype),
        sigma=jnp.asarray([1.0, 1.0, 0.5, 0.3, 0.2, 0.1], dtype),
        beta=jnp.ones(6, dtype), alpha=jnp.asarray([1, .5, .3, 0, 0, 0], dtype),
        gamma=jnp.asarray([0, 1e4, 2e4, 0, 0, 0], dtype),
        ewt=jnp.full(3, 1e4, dtype),
        ee=jnp.full(3, 1e-6, dtype),
        eps_newt=jnp.asarray(0.33, dtype), toldel=jnp.asarray(3e-5, dtype),
        yypredict=jnp.asarray([0.9, 1e-5, 0.1], dtype),
        yppredict=jnp.asarray([-0.03, 1e-6, 0.03], dtype),
        yy=jnp.asarray([0.9, 1e-5, 0.1], dtype),
        yp=jnp.asarray([-0.03, 1e-6, 0.03], dtype),
        savres=jnp.full(3, 1e-7, dtype),
        phi=jnp.ones((6, 3), dtype) * jnp.asarray([1, 1e-2, 1e-4, 1e-6, 0, 0], dtype)[:, None],
    )
    treedef, plan = _template(st1)
    states_T = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[..., None],
                                   jnp.asarray(x).shape + (b,)), st1)
    fbuf, ibuf = _pack_tail(states_T, plan)
    params_T = jnp.moveaxis(params_b, 0, -1)
    frows, irows, prows = fbuf.shape[0], ibuf.shape[0], params_T.shape[0]

    def stage_fn(state_T, prob, tout_l):
        from ida_tpu.core.coeffs import set_coeffs, predict, restore
        from ida_tpu.core.nls import nonlinear_solve
        from ida_tpu.core.error_test import error_test
        from ida_tpu.core.complete_step import complete_step
        from ida_tpu.core.step import attempt_once
        from ida_tpu.core.solve import solve as core_solve
        from ida_tpu.tol_control import TolControl

        if stage == "set_coeffs":
            st, ck = set_coeffs(state_T)
            return predict(st)
        if stage == "nls":
            st, nl = nonlinear_solve(state_T, prob, opts)
            return st._replace(ss=st.ss + nl.astype(dtype))
        if stage == "error_test":
            st, res = error_test(state_T, prob, opts, jnp.full((b,), 0.5, dtype))
            return st._replace(ss=st.ss + res.err_k + res.err_km1
                               + res.converged.astype(dtype))
        if stage == "complete_step":
            return complete_step(state_T, prob, opts,
                                 jnp.full((b,), 1e-3, dtype),
                                 jnp.full((b,), 2e-3, dtype))
        if stage == "attempt":
            z = jnp.zeros((b,), jnp.int32)
            st, success, fatal, ck, err_k, err_km1, ncf, nef = attempt_once(
                state_T, prob, opts, state_T.tn, z, z)
            return st._replace(ss=st.ss + err_k,
                               kk=st.kk + success.astype(jnp.int32) + fatal + ncf + nef)
        if stage == "solve":
            st, tret, ist = core_solve(
                state_T, prob, opts,
                TolControl(rtol=jnp.full((b,), 1e-4, dtype),
                           atol=jnp.full((3, b), 1e-6, dtype)),
                tout_l, 0)
            return st._replace(ss=st.ss + tret + ist.astype(dtype))
        if stage == "prologue":
            from ida_tpu.core.solve import _first_call_init
            st, ist = _first_call_init(state_T, prob, opts,
                TolControl(rtol=jnp.full((b,), 1e-4, dtype),
                           atol=jnp.full((3, b), 1e-6, dtype)), tout_l)
            return st._replace(ss=st.ss + ist.astype(dtype))
        if stage == "stoptest":
            from ida_tpu.core.solve import _stop_test1, _stop_test2
            st, tret, ist = _stop_test1(state_T, tout_l, state_T.tn, 0)
            st2, tret2, ist2 = _stop_test2(st, tout_l, tret, 0)
            return st2._replace(ss=st2.ss + tret2 + ist.astype(dtype) + ist2.astype(dtype))
        if stage == "getsol":
            from ida_tpu.core.interp import get_solution
            st, ok = get_solution(state_T, tout_l)
            return st._replace(ss=st.ss + ok.astype(dtype))
        if stage == "loop_only":
            from ida_tpu.core.solve import _Loop, _run_attempt_loop
            init = _Loop(state=state_T, tret=state_T.tn,
                         istate=jnp.zeros((b,), jnp.int32),
                         nstloc=jnp.zeros((b,), jnp.int32),
                         saved_t=state_T.tn,
                         ncf=jnp.zeros((b,), jnp.int32),
                         nef=jnp.zeros((b,), jnp.int32),
                         fresh=jnp.ones((b,), bool))
            st, tret, ist, carry = _run_attempt_loop(
                init, prob, opts,
                TolControl(rtol=jnp.full((b,), 1e-4, dtype),
                           atol=jnp.full((3, b), 1e-6, dtype)),
                tout_l, 0, 16)
            return st._replace(ss=st.ss + tret + ist.astype(dtype) + carry[0])
        if stage == "solve_budget":
            st, tret, ist, carry = core_solve(
                state_T, prob, opts,
                TolControl(rtol=jnp.full((b,), 1e-4, dtype),
                           atol=jnp.full((3, b), 1e-6, dtype)),
                tout_l, 0, max_attempts=32)
            return st._replace(ss=st.ss + tret + ist.astype(dtype)
                               + carry[0] + carry[2].astype(dtype))
        raise SystemExit(f"unknown stage {stage}")

    def kern(pref, fref, iref, fout, iout):
        state_T = _unpack_tail(fref[:], iref[:], treedef, plan)
        tout_l = jnp.full((tile,), 0.4, dtype)
        st = stage_fn(state_T, roberts_factory(pref[:]), tout_l)
        fb, ib = _pack_tail(st, plan)
        fout[:] = fb
        iout[:] = ib

    def fn(params_T, fbuf, ibuf):
        return pl.pallas_call(
            kern,
            grid=(b // tile,),
            out_shape=(
                jax.ShapeDtypeStruct((frows, b), jnp.float32),
                jax.ShapeDtypeStruct((irows, b), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec((prows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((frows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((irows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((frows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((irows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(params_T, fbuf, ibuf)

    return fn, (params_T, fbuf, ibuf)


def compile_stage(stage: str, tile: int, run: bool = False, interpret: bool = False) -> tuple[bool, str]:
    import jax

    box = {}

    def work():
        sys.setrecursionlimit(10_000_000)
        try:
            from ida_tpu.norms import unrolled_reduces
            with jax.enable_x64(False), unrolled_reduces():
                fn, args = build_stage(stage, tile, interpret=interpret)
                lowered = jax.jit(fn).lower(*args)
                compiled = lowered.compile()
                if run or interpret:
                    out = compiled(*args)
                    np.asarray(out[0])
                box["ok"] = True
        except BaseException as e:  # noqa: BLE001
            box["ok"] = False
            box["err"] = "".join(traceback.format_exception_only(type(e), e))[-2000:]

    old = threading.stack_size(6 << 30)
    try:
        t = threading.Thread(target=work)
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    return box.get("ok", False), box.get("err", "")


STAGES = ["set_coeffs", "nls", "error_test", "complete_step", "attempt", "prologue", "stoptest", "getsol", "loop_only", "solve", "solve_budget"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="+", help=f"{STAGES} or 'all'")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--run", action="store_true", help="also execute on chip")
    ap.add_argument("--cpu", action="store_true", help="interpret-free CPU lowering check")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    stages = STAGES if args.stages == ["all"] else args.stages
    for s in stages:
        ok, err = compile_stage(s, args.tile, run=args.run, interpret=args.cpu)
        print(f"[{'OK' if ok else 'FAIL'}] {s}")
        if not ok:
            print("      " + err.replace("\n", "\n      ")[:1500])


if __name__ == "__main__":
    main()
