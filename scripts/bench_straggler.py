"""Measure lockstep straggler waste + stratified sub-batching on TPU at
production batch sizes (PERF.md roadmap item; VERDICT r1 item 8).

Ensemble with a WIDE stiffness spread (rate constants x10^±1, a 2-decade
spread): a lockstep batch runs until its slowest lane finishes, so fast
lanes idle. make_stratified_solve sorts lanes by a pilot-solve cost key and
solves k contiguous sub-batches so similar-cost lanes run together.

    python scripts/bench_straggler.py --batch 65536 --chunks 1 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--chunks", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--spread", type=float, default=1.0, help="log10 half-spread")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
    from ida_tpu.parallel import ensemble_init, make_ensemble_solve
    from ida_tpu.parallel.batch import make_stratified_solve, pilot_cost
    from ida_tpu.tol_control import tol_sv

    b = args.batch
    dtype = jnp.float64
    rng = np.random.default_rng(0)
    scale = 10.0 ** rng.uniform(-args.spread, args.spread, b)
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (b, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    tol = tol_sv(1.0e-4, jnp.asarray([1e-8, 1e-6, 1e-6], dtype), dtype=dtype)

    def fresh():
        return ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype)

    results = {}
    base = make_ensemble_solve(roberts_factory, donate=False)

    # pilot cost key (cheap; reuses the base compile at a different tout)
    states = fresh()
    cost = pilot_cost(roberts_factory, states, params, tol, 0.4)
    cost_h = np.asarray(cost)
    print(f"pilot nst: min={cost_h.min()} mean={cost_h.mean():.1f} max={cost_h.max()}",
          flush=True)

    for k in args.chunks:
        states = fresh()
        if k == 1:
            fn = lambda st: base(st, params, tol, jnp.asarray(args.tout, dtype))  # noqa: E731
        else:
            strat = make_stratified_solve(roberts_factory, n_chunks=k)
            fn = lambda st: strat(st, params, tol, args.tout, cost)  # noqa: E731
        out = fn(states)
        _ = np.asarray(out[0].nst)  # compile+sync
        states = fresh()
        _ = np.asarray(states.nst)
        t0 = time.perf_counter()
        st, tret, ist = fn(states)
        nst = np.asarray(st.nst)
        dt = time.perf_counter() - t0
        ok = int((np.asarray(ist) == 0).sum())
        agg = nst.sum() / dt
        results[f"k={k}"] = {
            "agg_steps_per_sec": round(float(agg), 1),
            "wall_s": round(dt, 4),
            "total_steps": float(nst.sum()),
            "ok": ok,
        }
        print(f"k={k}: {agg/1e6:.1f}M steps/s (wall {dt:.3f}s, ok={ok}/{b})",
              flush=True)

    print(json.dumps({"straggler_bench": {"batch": b, "spread_decades": 2 * args.spread,
                                          **results}}))


if __name__ == "__main__":
    main()
