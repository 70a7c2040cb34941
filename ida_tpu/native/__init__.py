"""Native (C++) serial IDA oracle: differential-testing reference + CPU
baseline.

Role parity with the reference's ``sundials-sys`` FFI oracle (reference
benches/dense.rs:10-158): an independent, native-speed implementation of
the same BDF/Newton/LU algorithm to (a) cross-validate the JAX solver's
trajectories and statistics and (b) anchor bench.py's "serial CPU IDA"
baseline with real native code rather than a JAX-on-CPU stand-in.

The library builds on demand with g++ (no external deps); bindings use
ctypes (pybind11 is not available in this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "ida_oracle.cpp"
_LIB = _HERE / "libida_oracle.so"

_RES_FN = ctypes.CFUNCTYPE(
    None, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.c_void_p,
)
_JAC_FN = ctypes.CFUNCTYPE(
    None, ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.c_void_p,
)
_ROOT_FN = ctypes.CFUNCTYPE(
    None, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.c_void_p,
)

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
        check=True,
        capture_output=True,
    )


def load() -> ctypes.CDLL:
    """Load (building if needed) the oracle shared library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.ida_oracle_solve.restype = ctypes.c_int
    lib.ida_oracle_solve.argtypes = [
        ctypes.c_int, _RES_FN, _JAC_FN, ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
    ]
    lib.ida_oracle_solve_traced.restype = ctypes.c_int
    lib.ida_oracle_solve_traced.argtypes = [
        ctypes.c_int, _RES_FN, _JAC_FN, ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.c_double, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
    ]
    lib.ida_oracle_solve_roots.restype = ctypes.c_int
    lib.ida_oracle_solve_roots.argtypes = [
        ctypes.c_int, _RES_FN, _JAC_FN, ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, _ROOT_FN, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.ida_oracle_calc_ic.restype = ctypes.c_int
    lib.ida_oracle_calc_ic.argtypes = [
        ctypes.c_int, _RES_FN, _JAC_FN, ctypes.c_void_p, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
    ]
    lib.ida_oracle_roberts_bench.restype = ctypes.c_long
    lib.ida_oracle_roberts_bench.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.ida_oracle_roberts_roots_bench.restype = ctypes.c_long
    lib.ida_oracle_roberts_roots_bench.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ida_oracle_roberts_trajectory.restype = ctypes.c_int
    lib.ida_oracle_roberts_trajectory.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
    ]
    _lib = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def oracle_solve(res, jac, y0, yp0, touts, rtol, atol, t0=0.0, mxstep=100000,
                 hin=0.0):
    """Integrate with the native oracle using Python callbacks.

    res(t, y, yp) -> r and jac(t, cj, y, yp, r) -> J (row-major [n, n]),
    operating on/returning numpy arrays. ``hin`` nonzero overrides the
    initial-step heuristic (IDASetInitStep role). Returns (y_out [nout, n],
    stats dict)."""
    lib = load()
    y0 = np.ascontiguousarray(y0, np.float64)
    yp0 = np.ascontiguousarray(yp0, np.float64)
    n = y0.shape[0]
    atol = np.ascontiguousarray(np.broadcast_to(atol, (n,)), np.float64)
    touts = np.ascontiguousarray(touts, np.float64)
    nout = len(touts)
    y_out = np.zeros((nout, n))
    stats = np.zeros(7, np.int64)

    @_RES_FN
    def c_res(t, y, yp, r, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        out = res(t, ya, ypa)
        np.ctypeslib.as_array(r, (n,))[:] = out

    @_JAC_FN
    def c_jac(t, cj, y, yp, r, J, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        ra = np.ctypeslib.as_array(r, (n,))
        out = jac(t, cj, ya, ypa, ra)
        np.ctypeslib.as_array(J, (n * n,))[:] = np.asarray(out).reshape(-1)

    ret = lib.ida_oracle_solve(
        n, c_res, c_jac, None, t0, _dp(y0), _dp(yp0), rtol, _dp(atol),
        _dp(touts), nout, mxstep, hin, _dp(y_out),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    keys = ("nst", "nre", "nje", "nni", "netf", "ncfn", "nsetups")
    return ret, y_out, dict(zip(keys, stats.tolist()))


def oracle_solve_traced(res, jac, y0, yp0, touts, rtol, atol, trace_path,
                        t0=0.0, mxstep=100000, hin=0.0):
    """oracle_solve plus a per-step-attempt JSONL data trace at
    ``trace_path`` — the native half of the cross-engine trace diff
    (see Ida::dump_trace in ida_oracle.cpp; the JAX half is
    ida_tpu/utils/trace.py). Returns (ret, y_out [nout, n], stats)."""
    lib = load()
    y0 = np.ascontiguousarray(y0, np.float64)
    yp0 = np.ascontiguousarray(yp0, np.float64)
    n = y0.shape[0]
    atol = np.ascontiguousarray(np.broadcast_to(atol, (n,)), np.float64)
    touts = np.ascontiguousarray(touts, np.float64)
    nout = len(touts)
    y_out = np.zeros((nout, n))
    stats = np.zeros(7, np.int64)

    @_RES_FN
    def c_res(t, y, yp, r, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        np.ctypeslib.as_array(r, (n,))[:] = res(t, ya, ypa)

    @_JAC_FN
    def c_jac(t, cj, y, yp, r, J, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        ra = np.ctypeslib.as_array(r, (n,))
        np.ctypeslib.as_array(J, (n * n,))[:] = np.asarray(
            jac(t, cj, ya, ypa, ra)
        ).reshape(-1)

    ret = lib.ida_oracle_solve_traced(
        n, c_res, c_jac, None, t0, _dp(y0), _dp(yp0), rtol, _dp(atol),
        _dp(touts), nout, mxstep, hin, str(trace_path).encode(),
        _dp(y_out), stats.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    keys = ("nst", "nre", "nje", "nni", "netf", "ncfn", "nsetups")
    return ret, y_out, dict(zip(keys, stats.tolist()))


def oracle_solve_roots(res, jac, root, nrt, y0, yp0, touts, rtol, atol,
                       t0=0.0, mxstep=100000, hin=0.0, rootdir=None,
                       max_events=32):
    """Integrate with rootfinding (the C IDARcheck1/2/3 + IDARootfind
    machinery mirrored in the oracle — the differential reference for
    ida_tpu/core/root.py's Illinois stack).

    ``root(t, y, yp) -> g [nrt]``; ``rootdir`` as in IDASetRootDirection
    (0 both, +1 increasing only, -1 decreasing only). Returns
    ``(ret, y_out [nout, n], events, stats)`` where events is a list of
    ``(t_root, iroots [nrt])`` in crossing order (iroots signs: +1
    increasing g, -1 decreasing) and stats adds ``nge``."""
    lib = load()
    y0 = np.ascontiguousarray(y0, np.float64)
    yp0 = np.ascontiguousarray(yp0, np.float64)
    n = y0.shape[0]
    atol = np.ascontiguousarray(np.broadcast_to(atol, (n,)), np.float64)
    touts = np.ascontiguousarray(touts, np.float64)
    nout = len(touts)
    y_out = np.zeros((nout, n))
    stats = np.zeros(8, np.int64)
    ev_t = np.zeros(max_events)
    ev_iroots = np.zeros((max_events, nrt), np.int32)
    n_ev = ctypes.c_int(0)
    rd = np.ascontiguousarray(
        np.zeros(nrt, np.int32) if rootdir is None else rootdir, np.int32
    )

    @_RES_FN
    def c_res(t, y, yp, r, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        np.ctypeslib.as_array(r, (n,))[:] = res(t, ya, ypa)

    @_JAC_FN
    def c_jac(t, cj, y, yp, r, J, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        ra = np.ctypeslib.as_array(r, (n,))
        np.ctypeslib.as_array(J, (n * n,))[:] = np.asarray(
            jac(t, cj, ya, ypa, ra)
        ).reshape(-1)

    @_ROOT_FN
    def c_root(t, y, yp, g, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        np.ctypeslib.as_array(g, (nrt,))[:] = root(t, ya, ypa)

    ret = lib.ida_oracle_solve_roots(
        n, c_res, c_jac, None, t0, _dp(y0), _dp(yp0), rtol, _dp(atol),
        nrt, c_root, rd.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _dp(touts), nout, mxstep, hin, _dp(y_out), _dp(ev_t),
        ev_iroots.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_events, ctypes.byref(n_ev),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    keys = ("nst", "nre", "nje", "nni", "netf", "ncfn", "nsetups", "nge")
    nev = min(n_ev.value, max_events)
    events = [(float(ev_t[i]), ev_iroots[i].copy()) for i in range(nev)]
    return ret, y_out, events, dict(zip(keys, stats.tolist()))


def oracle_calc_ic(res, jac, y0, yp0, tout1, rtol, atol, icopt=1, id_mask=None,
                   t0=0.0):
    """Native IDACalcIC (C ida_ic.c structure: mxnh hic retries, frozen-J
    maxnj refreshes, linesearch with the steptol lower bound). Corrects and
    returns (ret, y0c, yp0c, stats) with stats = {nni, nje, nbacktr};
    ret == 0 on success. ``icopt``: 1 = YA_YDP_INIT (requires ``id_mask``,
    1.0 differential / 0.0 algebraic), 2 = Y_INIT."""
    lib = load()
    y0 = np.ascontiguousarray(y0, np.float64).copy()
    yp0 = np.ascontiguousarray(yp0, np.float64).copy()
    n = y0.shape[0]
    atol = np.ascontiguousarray(np.broadcast_to(atol, (n,)), np.float64)
    if icopt == 1:
        assert id_mask is not None, "YA_YDP needs the differential/alg id"
        id_arr = np.ascontiguousarray(id_mask, np.float64)
    else:
        id_arr = np.zeros(n)
    stats = np.zeros(3, np.int64)

    @_RES_FN
    def c_res(t, y, yp, r, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        np.ctypeslib.as_array(r, (n,))[:] = res(t, ya, ypa)

    @_JAC_FN
    def c_jac(t, cj, y, yp, r, J, _):
        ya = np.ctypeslib.as_array(y, (n,))
        ypa = np.ctypeslib.as_array(yp, (n,))
        ra = np.ctypeslib.as_array(r, (n,))
        np.ctypeslib.as_array(J, (n * n,))[:] = np.asarray(
            jac(t, cj, ya, ypa, ra)
        ).reshape(-1)

    ret = lib.ida_oracle_calc_ic(
        n, c_res, c_jac, None, t0, tout1, _dp(y0), _dp(yp0), rtol, _dp(atol),
        icopt, _dp(id_arr),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return ret, y0, yp0, dict(zip(("nni", "nje", "nbacktr"), stats.tolist()))


def oracle_roberts_trajectory(touts):
    """Built-in Roberts trajectory: (ret, y_out [nout, 3], nst [nout])."""
    lib = load()
    touts = np.ascontiguousarray(touts, np.float64)
    nout = len(touts)
    y_out = np.zeros((nout, 3))
    nst = np.zeros(nout, np.int64)
    ret = lib.ida_oracle_roberts_trajectory(
        _dp(touts), nout, _dp(y_out), nst.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    )
    return ret, y_out, nst


def oracle_roberts_bench(touts, reps=1):
    """Native-speed Roberts integration (built-in problem, no Python
    callbacks). Returns (total_steps, y_final)."""
    lib = load()
    touts = np.ascontiguousarray(touts, np.float64)
    y_final = np.zeros(3)
    total = lib.ida_oracle_roberts_bench(
        _dp(touts), len(touts), reps, _dp(y_final)
    )
    return int(total), y_final


def oracle_roberts_roots_bench(touts, reps=1):
    """Native-speed Roberts WITH the two idaRoberts_dns root functions
    (built-in, no Python callbacks) — the serial denominator for the
    rootfinding bench leg. Returns (total_steps, event_times [<=4])."""
    lib = load()
    touts = np.ascontiguousarray(touts, np.float64)
    ev_t = np.zeros(4)
    n_ev = ctypes.c_int(0)
    total = lib.ida_oracle_roberts_roots_bench(
        _dp(touts), len(touts), reps, _dp(ev_t), ctypes.byref(n_ev)
    )
    return int(total), ev_t[: min(n_ev.value, 4)].copy()
