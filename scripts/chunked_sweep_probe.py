"""Probe: does sorted contiguous CHUNKING beat the single whole-batch run
on the canonical 12-decade sweep?

The fused dense-output sweep at B=262144 runs at ~60% lockstep occupancy:
per-lane TOTAL step counts over 12 decades scatter with the parameter
spread, and the wall is set by the slowest lane (PERF.md round 3). The
ensemble is built sorted by rate-constant scale, so slicing it into k
contiguous chunks makes each chunk's scatter ~1/k of the whole — IF step
counts are monotone-ish in the scale. Each chunk then pays the (lower)
throughput of its smaller batch. This script measures both sides:

  1. whole-batch fused sweep wall + the per-lane nst distribution
     (quantiles + implied occupancy),
  2. k chunks of B/k lanes each (same total lanes), summed walls.

Usage:  python scripts/chunked_sweep_probe.py [--batch 262144] [--k 4]
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


def make_sweep(tol_T, touts):
    """params_T is a runtime ARGUMENT (not a captured constant) so one
    compiled executable serves every chunk of the same shape."""
    import jax
    import jax.numpy as jnp
    from ida_tpu import constants as C
    from ida_tpu.core.solve import solve_dense
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory

    def sweep(st, params_T):
        prob_T = roberts_factory(params_T)
        st, _tret, ist, _yy, _yp, _nst = solve_dense(
            st, prob_T, IdaOptions(), tol_T, touts
        )
        return st.nst, jnp.sum((ist == C.SUCCESS).astype(jnp.int32))

    return jax.jit(sweep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--k", type=int, default=4)
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
    touts = jnp.asarray([0.4 * 10.0 ** d for d in range(12)], dtype)
    B, k = args.batch, args.k
    bc = B // k

    # --- whole batch ---
    st, pT, tol = setup(-0.2, 0.2, B, dtype)
    fn = make_sweep(tol, touts)
    nst, ok = fn(st, pT)
    nst = np.asarray(nst, float)
    print(f"whole B={B}: ok_lanes={int(ok)}  nst quantiles "
          f"[min 1% 50% 99% max] = "
          f"{[round(q,1) for q in np.quantile(nst, [0,.01,.5,.99,1])]}  "
          f"occupancy(mean/max)={nst.mean()/nst.max():.3f}")
    walls = []
    for _ in range(args.reps):
        st, pT, _ = setup(-0.2, 0.2, B, dtype)
        _ = np.asarray(st.nst)
        t0 = time.perf_counter()
        out = fn(st, pT)
        _ = np.asarray(out[0][:1])
        walls.append(time.perf_counter() - t0)
    w_whole = min(walls)
    total = nst.sum()
    print(f"whole: wall={w_whole:.3f}s  agg={total/w_whole/1e6:.1f}M steps/s  "
          f"runs={[round(w,3) for w in walls]}")

    # --- k sorted chunks (same lanes: the scale range split contiguously;
    # ONE compiled chunk program, params passed in) ---
    edges = np.linspace(-0.2, 0.2, k + 1)
    stc0, pc0, tolc = setup(edges[0], edges[1], bc, dtype)
    fn_c = make_sweep(tolc, touts)
    _ = np.asarray(fn_c(stc0, pc0)[0][:1])  # compile + warm

    w_chunks, tot_c = [], 0.0
    for c in range(k):
        stc, pc, _ = setup(edges[c], edges[c + 1], bc, dtype)
        _ = np.asarray(stc.nst)
        t0 = time.perf_counter()
        nst_c, ok_c = fn_c(stc, pc)
        nst_c = np.asarray(nst_c, float)
        w_chunks.append(time.perf_counter() - t0)
        tot_c += nst_c.sum()
        print(f"chunk {c}: wall={w_chunks[-1]:.3f}s  ok={int(ok_c)}  "
              f"occ={nst_c.mean()/nst_c.max():.3f}")
    w_sum = sum(w_chunks)
    print(f"chunked k={k}: wall={w_sum:.3f}s  agg={tot_c/w_sum/1e6:.1f}M  "
          f"vs whole {total/w_whole/1e6:.1f}M  "
          f"speedup={w_whole/w_sum:.3f}x")


if __name__ == "__main__":
    main()
