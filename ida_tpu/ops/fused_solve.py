"""Whole-solve-in-one-kernel: the entire adaptive BDF integration of an
ensemble tile runs inside a single Pallas TPU kernel.

Motivation (PERF.md): the vmapped XLA solver is kernel-count bound — each
lockstep step dispatches ~1400 small fused ops against HBM. Here the whole
``core.solve`` program — coefficient recurrences, Newton iterations,
batched LU, error tests, order/step control — is traced INSIDE a Pallas
kernel over a batch-LAST state layout, so Mosaic compiles it to one TPU
program with every state vector pinned in VMEM for the full integration:
one kernel launch per tile, zero HBM roundtrips between steps.

Implementation: the ``IdaState`` pytree is packed into two [rows, TILE]
buffers (floats and ints; the batch rides the 128-wide lane dimension), and
the solver core runs BATCH-NATIVELY on the batch-last state — no vmap, so
the kernel traces one program instead of a per-lane batching transform
(validated bit-identical to the XLA path in tests/test_fused_solve.py and
tests/test_batch_native.py).

float32 only (Mosaic has no f64) and int32 counters; the grid tiles the
batch. nroots must be 0 (this is the bench/throughput path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.solve import solve as core_solve, TASK_NORMAL
from ..core.state import IdaState, IdaOptions
from ..tol_control import TolControl

_INT_KINDS = ("i", "u", "b")

# Tiles are independent (pure per-lane integration): mark the grid dim
# parallel and raise the scoped-VMEM cap so wide tiles (>= 4096 lanes, the
# VPU-saturating regime) fit; the 16 MiB default rejects them.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _template(one_state: IdaState):
    """Static packing plan from a single-instance state: per-leaf
    (is_int, rows, shape, dtype)."""
    leaves, treedef = jax.tree_util.tree_flatten(one_state)
    plan = []
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        # rows == 0 for empty leaves (e.g. the refined-mode lsetup-point
        # vectors, sized [0] outside that mode): packed as nothing and
        # reconstructed as empty on unpack
        plan.append(
            (
                leaf.dtype.kind in _INT_KINDS,
                int(np.prod(leaf.shape)),
                leaf.shape,
                leaf.dtype,
            )
        )
    return treedef, plan


def _pack_tail(state_T: IdaState, plan) -> Tuple[jax.Array, jax.Array]:
    """Batch-LAST state (leaves shape + (B,)) -> (fbuf [Fr,B], ibuf [Ir,B])."""
    leaves = jax.tree_util.tree_leaves(state_T)
    fparts, iparts = [], []
    for leaf, (is_int, rows, shape, dtype) in zip(leaves, plan):
        if rows == 0:
            continue
        b = leaf.shape[-1]
        flat = leaf.reshape((rows, b))
        (iparts if is_int else fparts).append(
            flat.astype(jnp.int32) if is_int else flat.astype(jnp.float32)
        )
    return jnp.concatenate(fparts, 0), jnp.concatenate(iparts, 0)


def _unpack_tail(fbuf, ibuf, treedef, plan) -> IdaState:
    """(fbuf [Fr,B], ibuf [Ir,B]) -> batch-LAST state pytree."""
    fi = ii = 0
    leaves = []
    for is_int, rows, shape, dtype in plan:
        if rows == 0:
            # empty leaf: reconstruct in the same kernel-dtype convention
            # as packed leaves (bool stays bool, ints i32, floats f32)
            b = fbuf.shape[-1]
            edt = (
                jnp.bool_ if dtype == jnp.bool_
                else jnp.int32 if jnp.dtype(dtype).kind in _INT_KINDS
                else jnp.float32
            )
            leaves.append(jnp.zeros(shape + (b,), edt))
            continue
        if is_int:
            chunk = ibuf[ii : ii + rows]
            ii += rows
            if dtype == jnp.bool_:
                chunk = chunk != 0
        else:
            chunk = fbuf[fi : fi + rows]
            fi += rows
        leaves.append(chunk.reshape(shape + (chunk.shape[-1],)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _to_kernel_dtypes(tree):
    """f32 floats, i32 ints (Mosaic has neither f64 nor i64)."""

    def conv(x):
        x = jnp.asarray(x)
        if x.dtype.kind == "f":
            return x.astype(jnp.float32)
        if x.dtype == jnp.int64:
            return x.astype(jnp.int32)
        return x

    return jax.tree_util.tree_map(conv, tree)


def make_fused_solve(
    problem_factory,
    tol: TolControl,
    opts: IdaOptions = IdaOptions(),
    *,
    tile: int = 1024,
    interpret: bool = False,
    attempt_budget: int | None = None,
):
    """Build ``fn(states_b, params_b, tout) -> (states_b, tret[B], istate[B])``
    executing the whole solve as one Pallas kernel per batch tile.

    ``states_b`` is a standard batch-leading IdaState (use
    ``ensemble_init(..., dtype=jnp.float32)``).

    ``attempt_budget``: bound the in-kernel attempt loop to a FIXED trip
    count (static ``scf.for`` — the Mosaic-accepted loop form; PERF.md) and
    continue on the host: the kernel is relaunched, resuming from an exact
    carry that rides extra buffer rows, until every lane is done. Budgeted +
    resumed is bit-identical to the unbudgeted while loop
    (tests/test_budgeted_solve.py).

    Tracing/lowering the kernel recurses linearly in its (very large)
    program size, so the returned ``fn`` runs inside a worker thread with a
    large stack and a raised recursion limit."""
    tol32 = _to_kernel_dtypes(tol)
    if attempt_budget is not None:
        return _make_budgeted_fused_solve(
            problem_factory, tol32, opts, tile=tile, interpret=interpret,
            attempt_budget=attempt_budget,
        )

    def fn(states_b: IdaState, params_b, tout):
        params_b = jnp.asarray(params_b, jnp.float32)
        b = params_b.shape[0]
        assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"

        probe = problem_factory(jax.tree_util.tree_map(lambda x: x[0], params_b))
        if probe.nroots:
            raise NotImplementedError(
                "fused_solve: rootfinding (nroots > 0) is not supported in "
                "the fused Pallas kernel path; use the XLA ensemble solver "
                "(parallel.make_ensemble_solve) for problems with events"
            )

        one_state = jax.tree_util.tree_map(lambda x: x[0], states_b)
        treedef, plan = _template(one_state)

        # batch-leading -> batch-last packing
        states_T = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, -1), states_b
        )
        fbuf, ibuf = _pack_tail(states_T, plan)
        srows = fbuf.shape[0]  # state rows (before the extras)

        # extras ride extra float rows (per lane: tout, rtol, atol[N]) — the
        # kernel must not capture traced constants, and this also makes
        # per-lane tolerances possible
        atol_b = jnp.broadcast_to(
            jnp.atleast_1d(tol32.atol), (b, one_state.yy.shape[0])
        ).T if jnp.ndim(tol32.atol) <= 1 else jnp.moveaxis(tol32.atol, 0, -1)
        extras = jnp.concatenate(
            [
                jnp.full((1, b), jnp.asarray(tout, jnp.float32)),
                jnp.broadcast_to(jnp.asarray(tol32.rtol, jnp.float32), (1, b)),
                atol_b.astype(jnp.float32),
            ],
            axis=0,
        )
        fbuf = jnp.concatenate([fbuf, extras], axis=0)

        params_T = jnp.moveaxis(params_b, 0, -1)
        frows, irows, prows = fbuf.shape[0], ibuf.shape[0], params_T.shape[0]

        def kern(pref, fref, iref, fout, iout, tret_ref, ist_ref):
            fall = fref[:]
            state_T = _unpack_tail(fall[:srows], iref[:], treedef, plan)
            tout_l = fall[srows]  # [TILE]
            rtol_l = fall[srows + 1]
            atol_l = fall[srows + 2 :]  # [N, TILE]

            # batch-NATIVE solve: the core runs directly on the batch-last
            # state — no vmap, so the kernel jaxpr stays one program instead
            # of a per-lane batching transform (the round-1 tracing blocker)
            st, tret, ist = core_solve(
                state_T,
                problem_factory(pref[:]),
                opts,
                TolControl(rtol=rtol_l, atol=atol_l),
                tout_l,
                TASK_NORMAL,
            )
            fb, ib = _pack_tail(st, plan)
            fout[:] = jnp.concatenate([fb, fall[srows:]], axis=0)
            iout[:] = ib
            tret_ref[:] = tret.reshape(1, -1)
            ist_ref[:] = ist.reshape(1, -1)

        fout, iout, tret, ist = pl.pallas_call(
            kern,
            grid=(b // tile,),
            out_shape=(
                jax.ShapeDtypeStruct((frows, b), jnp.float32),
                jax.ShapeDtypeStruct((irows, b), jnp.int32),
                jax.ShapeDtypeStruct((1, b), jnp.float32),
                jax.ShapeDtypeStruct((1, b), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec((prows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((frows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((irows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((frows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((irows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(params_T, fbuf, ibuf)

        state_T = _unpack_tail(fout[:srows], iout, treedef, plan)
        states_out = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, -1, 0), state_T)
        return states_out, tret[0], ist[0]

    jfn = jax.jit(fn)

    def fn_big_stack(states_b, params_b, tout):  # noqa: D401 - see builder doc
        import sys
        import threading

        box = {}

        # dtype conversion happens OUTSIDE the jit boundary, and the kernel
        # traces with x64 disabled: under x64, Python scalar constants (the
        # status codes in every jnp.where) canonicalize to weak int64/f64,
        # and Mosaic's convert_element_type fallback recurses forever on
        # 64-bit integer casts (measured: ~1e6 recursive _convert_helper
        # calls before we diagnosed it). The kernel is f32/i32 throughout,
        # so tracing it in 32-bit mode is exact.
        states32 = _to_kernel_dtypes(states_b)

        def work():
            sys.setrecursionlimit(10_000_000)
            try:
                from ..norms import unrolled_reduces

                with jax.enable_x64(False), unrolled_reduces():
                    box["out"] = jfn(states32, params_b, tout)
            except BaseException as e:  # noqa: BLE001 - relay to caller
                box["err"] = e

        old = threading.stack_size(6 << 30)  # 6 GiB stack: lowering recursion is linear in the (huge) kernel jaxpr
        try:
            t = threading.Thread(target=work)
            t.start()
            t.join()
        finally:
            threading.stack_size(old)
        if "err" in box:
            raise box["err"]
        return box["out"]

    return fn_big_stack


def _call_big_stack(fn, *args):
    """Run fn(*args) in a 6 GiB-stack worker with x64 tracing disabled (see
    fn_big_stack in make_fused_solve for why)."""
    import sys
    import threading

    box = {}

    def work():
        sys.setrecursionlimit(10_000_000)
        try:
            from ..norms import unrolled_reduces

            with jax.enable_x64(False), unrolled_reduces():
                box["out"] = fn(*args)
        except BaseException as e:  # noqa: BLE001 - relay to caller
            box["err"] = e

    old = threading.stack_size(6 << 30)
    try:
        t = threading.Thread(target=work)
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "err" in box:
        raise box["err"]
    return box["out"]


def _make_budgeted_fused_solve(
    problem_factory,
    tol32: TolControl,
    opts: IdaOptions,
    *,
    tile: int,
    interpret: bool,
    attempt_budget: int,
):
    """Budgeted variant: the in-kernel attempt loop is a static scf.for of
    ``attempt_budget`` masked iterations; the exact loop carry (tret, istate,
    nstloc, saved_t, ncf, nef, fresh) rides extra buffer rows and the host
    relaunches the continuation kernel until every lane leaves CONTINUE."""
    from .. import constants as Cst

    def _specs(rows_list, tile):
        return [
            pl.BlockSpec((r, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in rows_list
        ]

    def _extras(one_state, b, tout):
        atol_b = jnp.broadcast_to(
            jnp.atleast_1d(tol32.atol), (b, one_state.yy.shape[0])
        ).T if jnp.ndim(tol32.atol) <= 1 else jnp.moveaxis(tol32.atol, 0, -1)
        return jnp.concatenate(
            [
                jnp.full((1, b), jnp.asarray(tout, jnp.float32)),
                jnp.broadcast_to(jnp.asarray(tol32.rtol, jnp.float32), (1, b)),
                atol_b.astype(jnp.float32),
            ],
            axis=0,
        )

    def _tolcontrol(fall, srows, stop=None):
        return TolControl(rtol=fall[srows + 1], atol=fall[srows + 2 : stop])

    def _pack_out(st, carry, fall_extras, plan):
        tret, ist, nstloc, saved_t, ncf, nef, fresh, ikind, itgt = carry
        fb, ib = _pack_tail(st, plan)
        fout = jnp.concatenate(
            [
                fb,
                fall_extras,
                tret.reshape(1, -1),
                saved_t.reshape(1, -1),
                itgt.reshape(1, -1),
            ],
            axis=0,
        )
        iout = jnp.concatenate(
            [
                ib,
                ist.reshape(1, -1),
                nstloc.reshape(1, -1),
                ncf.reshape(1, -1),
                nef.reshape(1, -1),
                fresh.astype(jnp.int32).reshape(1, -1),
                ikind.reshape(1, -1),
            ],
            axis=0,
        )
        return fout, iout

    def fn_init(states_T, params_T, tout):
        one_state = jax.tree_util.tree_map(lambda x: x[..., 0], states_T)
        treedef, plan = _template(one_state)
        fbuf, ibuf = _pack_tail(states_T, plan)
        srows, irows = fbuf.shape[0], ibuf.shape[0]
        b = params_T.shape[-1]
        fbuf = jnp.concatenate([fbuf, _extras(one_state, b, tout)], axis=0)
        frows, prows = fbuf.shape[0], params_T.shape[0]
        frows2, irows2 = frows + 3, irows + 6

        def kern(pref, fref, iref, fout, iout):
            fall = fref[:]
            state_T = _unpack_tail(fall[:srows], iref[:], treedef, plan)
            st, tret, ist, carry = core_solve(
                state_T, problem_factory(pref[:]), opts,
                _tolcontrol(fall, srows), fall[srows], TASK_NORMAL,
                max_attempts=attempt_budget,
            )
            fo, io = _pack_out(st, carry, fall[srows:], plan)
            fout[:] = fo
            iout[:] = io

        return pl.pallas_call(
            kern,
            grid=(b // tile,),
            out_shape=(
                jax.ShapeDtypeStruct((frows2, b), jnp.float32),
                jax.ShapeDtypeStruct((irows2, b), jnp.int32),
            ),
            in_specs=_specs([prows, frows, irows], tile),
            out_specs=tuple(_specs([frows2, irows2], tile)),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(params_T, fbuf, ibuf)

    def fn_cont(states_T, params_T, fbuf2, ibuf2):
        one_state = jax.tree_util.tree_map(lambda x: x[..., 0], states_T)
        treedef, plan = _template(one_state)
        srows = sum(r for is_int, r, *_ in plan if not is_int)
        irows = sum(r for is_int, r, *_ in plan if is_int)
        b = params_T.shape[-1]
        frows2, irows2, prows = fbuf2.shape[0], ibuf2.shape[0], params_T.shape[0]

        def kern(pref, fref, iref, fout, iout):
            fall = fref[:]
            iall = iref[:]
            state_T = _unpack_tail(fall[:srows], iall[:irows], treedef, plan)
            carry = (
                fall[frows2 - 3],            # tret
                iall[irows],                 # istate
                iall[irows + 1],             # nstloc
                fall[frows2 - 2],            # saved_t
                iall[irows + 2],             # ncf
                iall[irows + 3],             # nef
                iall[irows + 4] != 0,        # fresh
                iall[irows + 5],             # ikind
                fall[frows2 - 1],            # itgt
            )
            st, tret, ist, carry = core_solve(
                state_T, problem_factory(pref[:]), opts,
                _tolcontrol(fall, srows, frows2 - 3), fall[srows], TASK_NORMAL,
                max_attempts=attempt_budget, resume_carry=carry,
            )
            fo, io = _pack_out(st, carry, fall[srows : frows2 - 3], plan)
            fout[:] = fo
            iout[:] = io

        return pl.pallas_call(
            kern,
            grid=(b // tile,),
            out_shape=(
                jax.ShapeDtypeStruct((frows2, b), jnp.float32),
                jax.ShapeDtypeStruct((irows2, b), jnp.int32),
            ),
            in_specs=_specs([prows, frows2, irows2], tile),
            out_specs=tuple(_specs([frows2, irows2], tile)),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(params_T, fbuf2, ibuf2)

    def fn_finish(states_T, fbuf2, ibuf2):
        one_state = jax.tree_util.tree_map(lambda x: x[..., 0], states_T)
        treedef, plan = _template(one_state)
        srows = sum(r for is_int, r, *_ in plan if not is_int)
        irows = sum(r for is_int, r, *_ in plan if is_int)
        st_T = _unpack_tail(fbuf2[:srows], ibuf2[:irows], treedef, plan)
        states_out = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, -1, 0), st_T)
        return states_out, fbuf2[fbuf2.shape[0] - 3], ibuf2[irows]

    jinit = jax.jit(fn_init)
    jcont = jax.jit(fn_cont)
    jfinish = jax.jit(fn_finish)

    def fn(states_b: IdaState, params_b, tout):
        params_T = jnp.moveaxis(jnp.asarray(params_b, jnp.float32), 0, -1)
        b = params_T.shape[-1]
        assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"

        probe = problem_factory(jax.tree_util.tree_map(lambda x: x[..., 0], params_T))
        if probe.nroots:
            raise NotImplementedError(
                "fused_solve: rootfinding (nroots > 0) is not supported in "
                "the fused Pallas kernel path; use the XLA ensemble solver "
                "(parallel.make_ensemble_solve) for problems with events"
            )

        states32 = _to_kernel_dtypes(states_b)
        states_T = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(jnp.asarray(x), 0, -1), states32
        )
        tout32 = jnp.asarray(tout, jnp.float32)
        fbuf2, ibuf2 = _call_big_stack(jinit, states_T, params_T, tout32)
        irows_state = ibuf2.shape[0] - 6
        launches = 1
        while (np.asarray(ibuf2[irows_state]) == Cst.CONTINUE).any():
            fbuf2, ibuf2 = _call_big_stack(jcont, states_T, params_T, fbuf2, ibuf2)
            launches += 1
            if launches > 100_000:
                raise RuntimeError("fused_solve: runaway continuation loop")
        states_out, tret, ist = _call_big_stack(jfinish, states_T, fbuf2, ibuf2)
        return states_out, tret, ist

    return fn
