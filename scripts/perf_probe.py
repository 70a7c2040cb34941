"""Perf probe for the headline batch-native ensemble solve.

Builds the exact headline config (batch-native Roberts ensemble, f64,
tout=400), compiles once (persistent cache), times N reps, and prints XLA
cost-analysis numbers (bytes accessed / flops per execution) so byte-cut
levers can be evaluated quickly without the full bench.

Usage: python scripts/perf_probe.py [--batch 262144] [--tout 400]
           [--reps 3] [--f32] [--cost-only]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cost-only", action="store_true")
    ap.add_argument("--unroll-newton", action="store_true")
    ap.add_argument("--no-constraints", action="store_true",
                    help="IdaOptions(enable_constraints=False): skip tracing "
                         "the (identity) inequality-constraint block")
    ap.add_argument(
        "--compiler-option",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="XLA compiler option forwarded to .compile(compiler_options=...)"
        " (repeatable), e.g. xla_tpu_scoped_vmem_limit_kib=65536",
    )
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from functools import partial
    from ida_tpu import constants as C
    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory
    from ida_tpu.tol_control import TolControl

    sys.path.insert(0, ".")
    from bench import build

    dtype = jnp.float32 if args.f32 else jnp.float64
    batch = args.batch
    opts = IdaOptions(
        unroll_newton=args.unroll_newton,
        enable_constraints=not args.no_constraints,
    )

    states, params, _, _ = build(batch, dtype)
    states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
    prob_T = roberts_factory(jnp.moveaxis(params, 0, -1))
    atol = jnp.asarray([1e-8, 1e-6, 1e-6], dtype)
    tol_T = TolControl(
        rtol=jnp.full((batch,), 1e-4, dtype),
        atol=jnp.tile(atol[:, None], (1, batch)),
    )
    fn = jax.jit(
        partial(core_solve, problem=prob_T, opts=opts, tol=tol_T, itask=TASK_NORMAL)
    )
    tout_T = jnp.full((batch,), args.tout, dtype)

    for kv in args.compiler_option:
        if "=" not in kv:
            ap.error(f"--compiler-option needs KEY=VALUE, got {kv!r}")
    copts = dict(kv.split("=", 1) for kv in args.compiler_option)
    if copts:
        print(f"compiler_options: {copts}", flush=True)

    t0 = time.perf_counter()
    lowered = fn.lower(states_T, tout=tout_T)
    compiled = lowered.compile(compiler_options=copts) if copts else lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    ca = compiled.cost_analysis()
    if ca:
        if isinstance(ca, list):
            ca = ca[0]
        print(
            f"cost_analysis: bytes={ca.get('bytes accessed', 0):.3e} "
            f"flops={ca.get('flops', 0):.3e}"
        )
    if args.cost_only:
        return

    out = compiled(states_T, tout=tout_T)
    nst = np.asarray(out[0].nst)
    ist = np.asarray(out[2])
    print(f"warm run: total_steps={nst.sum():.0f} ok={int((ist == C.SUCCESS).sum())}/{len(ist)}")
    att = nst + np.asarray(out[0].netf) + np.asarray(out[0].ncfn)
    for name, v in [("nst", nst), ("attempts", att)]:
        print(
            f"  {name}: min={v.min()} mean={v.mean():.1f} max={v.max()} "
            f"occupancy={v.mean() / v.max():.3f}"
        )

    walls = []
    for _ in range(args.reps):
        states, params, _, _ = build(batch, dtype)
        states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
        _ = np.asarray(states_T.nst)
        t0 = time.perf_counter()
        st, tret, istate = compiled(states_T, tout=tout_T)
        total = np.asarray(st.nst).sum()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    med = sorted(walls)[len(walls) // 2]
    print(
        f"steps/s best={total / best / 1e6:.1f}M median={total / med / 1e6:.1f}M "
        f"walls={[round(w, 4) for w in walls]}"
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
