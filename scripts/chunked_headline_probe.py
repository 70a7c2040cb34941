"""Probe: does running the tout=400 headline as k sequential sorted chunks
of B/k lanes beat the single whole-batch run?

Motivated by the chunked 12-decade sweep measurement (sorted k=4 chunks of
65536 ran 1.118x the single 262144 batch, scripts/chunked_sweep_probe.py):
per-lane-step cost measured LOWER at B=65536 than at 262144 on the fused
dense-output program, so the same may hold for the plain headline config.

Usage:  python scripts/chunked_headline_probe.py [--batch 262144] [--k 4]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def setup(lo, hi, batch, dtype):
    import jax
    import jax.numpy as jnp
    from ida_tpu.models import ROBERTS_PARAMS, ROBERTS_YY0, roberts_factory
    from ida_tpu.parallel import ensemble_init
    from ida_tpu.tol_control import TolControl

    scale = np.exp(np.linspace(lo, hi, batch))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (batch, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype)
    states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
    params_T = jnp.moveaxis(params, 0, -1)
    atol = jnp.asarray([1e-8, 1e-6, 1e-6], dtype)
    tol_T = TolControl(
        rtol=jnp.full((batch,), 1e-4, dtype),
        atol=jnp.tile(atol[:, None], (1, batch)),
    )
    return states_T, params_T, tol_T


def make_solve(tol_T, tout, batch, dtype):
    import jax
    import jax.numpy as jnp
    from ida_tpu import constants as C
    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory

    tout_T = jnp.full((batch,), tout, dtype)

    def run(st, params_T):
        prob_T = roberts_factory(params_T)
        st, _tret, ist = core_solve(
            st, tout=tout_T, problem=prob_T, opts=IdaOptions(), tol=tol_T,
            itask=TASK_NORMAL,
        )
        return st.nst, jnp.sum((ist == C.SUCCESS).astype(jnp.int32))

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    dtype = jnp.float64
    B, k = args.batch, args.k
    bc = B // k

    # --- whole batch ---
    st, pT, tol = setup(-0.2, 0.2, B, dtype)
    fn = make_solve(tol, args.tout, B, dtype)
    nst, ok = fn(st, pT)
    nst = np.asarray(nst, float)
    print(f"whole B={B}: ok={int(ok)}  nst[min/mean/max]="
          f"{nst.min():.0f}/{nst.mean():.1f}/{nst.max():.0f}")
    walls = []
    for _ in range(args.reps):
        st, pT, _ = setup(-0.2, 0.2, B, dtype)
        _ = np.asarray(st.nst[:1])
        t0 = time.perf_counter()
        out = fn(st, pT)
        _ = np.asarray(out[0][:1])
        walls.append(time.perf_counter() - t0)
    w_whole = min(walls)
    total = nst.sum()
    print(f"whole: wall={w_whole:.3f}s  agg={total/w_whole/1e6:.1f}M  "
          f"runs={[round(w,3) for w in walls]}")

    # --- k sorted chunks, ONE compiled program, params as argument ---
    edges = np.linspace(-0.2, 0.2, k + 1)
    stc, pc, tolc = setup(edges[0], edges[1], bc, dtype)
    fn_c = make_solve(tolc, args.tout, bc, dtype)
    _ = np.asarray(fn_c(stc, pc)[0][:1])  # compile + warm

    best = None
    for _ in range(args.reps):
        chunks = [setup(edges[c], edges[c + 1], bc, dtype) for c in range(k)]
        for stc, pc, _ in chunks:
            _ = np.asarray(stc.nst[:1])
        t0 = time.perf_counter()
        tot_c = 0.0
        for stc, pc, _ in chunks:
            nst_c, ok_c = fn_c(stc, pc)
            tot_c += float(np.asarray(nst_c, float).sum())
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
        print(f"chunked k={k}: wall={w:.3f}s  agg={tot_c/w/1e6:.1f}M")
    print(f"chunked best: {tot_c/best/1e6:.1f}M  vs whole "
          f"{total/w_whole/1e6:.1f}M  speedup={w_whole/best:.3f}x")


if __name__ == "__main__":
    main()
