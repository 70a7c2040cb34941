"""Measure the fused whole-solve Pallas kernel on the chip vs the XLA path.

    python scripts/bench_fused.py --batch 65536 --tile 1024 --budget 64
    python scripts/bench_fused.py --check   # small-batch correctness first
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--check", action="store_true",
                    help="small-batch correctness vs the XLA path (on chip)")
    ap.add_argument("--unroll-newton", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ida_tpu import constants as C
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS, ROBERTS_YY0
    from ida_tpu.ops.fused_solve import make_fused_solve
    from ida_tpu.parallel import ensemble_init, make_ensemble_solve
    from ida_tpu.norms import unrolled_reduces
    from ida_tpu.tol_control import tol_sv

    dtype = jnp.float32
    b = 256 if args.check else args.batch
    tile = min(args.tile, b)
    opts = IdaOptions(unroll_newton=True)

    scale = np.exp(np.linspace(-0.2, 0.2, b))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (b, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    tol = tol_sv(1.0e-4, jnp.asarray([1e-8, 1e-6, 1e-6], dtype), dtype=dtype)
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype, opts=opts)

    fused = make_fused_solve(roberts_factory, tol, opts, tile=tile,
                             attempt_budget=args.budget)
    tout = np.float32(args.tout if not args.check else 0.4)

    t0 = time.perf_counter()
    st, tret, ist = fused(states, params, tout)
    nst = np.asarray(st.nst)
    ist_h = np.asarray(ist)
    t_first = time.perf_counter() - t0
    print(f"first call (compile+run): {t_first:.1f}s; "
          f"ok={int((ist_h == C.SUCCESS).sum())}/{b} total_steps={nst.sum()}")

    if args.check:
        ref = make_ensemble_solve(roberts_factory, opts, donate=False)
        with unrolled_reduces():
            st_r, tret_r, ist_r = ref(states, params, tol, jnp.asarray(tout, dtype))
        ok = (
            np.array_equal(np.asarray(ist), np.asarray(ist_r))
            and np.array_equal(nst, np.asarray(st_r.nst))
            and np.array_equal(np.asarray(st.yy), np.asarray(st_r.yy))
            and np.array_equal(np.asarray(tret), np.asarray(tret_r))
        )
        print("BIT-IDENTICAL to on-chip XLA path:" , ok)
        if not ok:
            d = np.abs(np.asarray(st.yy) - np.asarray(st_r.yy)).max()
            print("  max |yy diff|:", d,
                  " nst equal:", np.array_equal(nst, np.asarray(st_r.nst)),
                  " ist equal:", np.array_equal(np.asarray(ist), np.asarray(ist_r)))
        return

    # timed run from fresh states
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype, opts=opts)
    _ = np.asarray(states.nst)
    t0 = time.perf_counter()
    st, tret, ist = fused(states, params, tout)
    nst = np.asarray(st.nst)
    dt = time.perf_counter() - t0
    ist_h = np.asarray(ist)
    print(
        f"fused budget={args.budget} tile={tile} B={b} tout={args.tout:g}: "
        f"{nst.sum()/dt/1e6:.1f}M steps/s (wall {dt:.3f}s, "
        f"ok={int((ist_h == C.SUCCESS).sum())}/{b})"
    )


if __name__ == "__main__":
    main()
