"""Headline benchmark: batched Roberts parameter sweep (BASELINE.md config 3).

Measures aggregate integrator throughput — internal BDF steps per second
summed over a vmapped ensemble of Roberts DAE instances with perturbed
chemistry — on whatever accelerator JAX exposes (one TPU chip under the
driver), and compares against the single-core native C++ IDA oracle
(ida_tpu/native — the serial "CPU IDA" baseline, which reproduces the
canonical C IDA Roberts statistics exactly).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
where vs_baseline is aggregate-accelerator-steps/sec over CPU-single
steps/sec; the BASELINE.md target is > 10.

Usage: python bench.py [--smoke] [--batch B] [--tout T]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build(batch, dtype):
    import jax.numpy as jnp
    from ida_tpu.models import ROBERTS_PARAMS, ROBERTS_YY0
    from ida_tpu.parallel import ensemble_init

    from ida_tpu.models import roberts_factory

    scale = np.exp(np.linspace(-0.2, 0.2, batch))
    params = jnp.asarray(np.outer(scale, ROBERTS_PARAMS), dtype)
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0, dtype), (batch, 1))
    yp0 = params[:, 0:1] * jnp.asarray([-1.0, 1.0, 0.0], dtype)
    states = ensemble_init(roberts_factory, params, yy0, yp0, dtype=dtype)
    return states, params, yy0, yp0


def run_ensemble(batch, tout, dtype, device=None, fused=False, tile=1024):
    import jax
    import jax.numpy as jnp
    from ida_tpu.models import roberts_factory
    from ida_tpu.parallel import make_ensemble_solve
    from ida_tpu.tol_control import tol_sv
    from ida_tpu import constants as C

    tol = tol_sv(1.0e-4, jnp.asarray([1e-8, 1e-6, 1e-6], dtype), dtype=dtype)
    if fused:
        # whole-solve-in-one-Pallas-kernel path (f32/i32; batch-native core)
        from ida_tpu.ops.fused_solve import make_fused_solve

        kern = make_fused_solve(roberts_factory, tol, tile=tile)
        solve = lambda st, p, _tol, t: kern(st, p, t)  # noqa: E731
    else:
        solve = make_ensemble_solve(roberts_factory, donate=False)

    ctx = jax.default_device(device) if device is not None else _nullcontext()
    with ctx:
        states, params, _, _ = build(batch, dtype)
        # compile + warm up (also forces a real device->host sync: on the
        # experimental axon platform block_until_ready can return early, so
        # all timing below syncs via host transfers)
        out = solve(states, params, tol, jnp.asarray(tout, dtype))
        _ = np.asarray(out[0].nst)
        # timed run from fresh states; the host transfer of the results is
        # the synchronization point
        states, params, _, _ = build(batch, dtype)
        _ = np.asarray(states.nst)  # make sure inputs are resident first
        t0 = time.perf_counter()
        states, tret, istate = solve(states, params, tol, jnp.asarray(tout, dtype))
        nst = np.asarray(states.nst)
        ist = np.asarray(istate)
        dt = time.perf_counter() - t0
    ok = ist == C.SUCCESS
    return float(nst.sum()), dt, int(ok.sum()), len(ist)


def os_environ_float(name, default):
    import os

    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def run_heat2d_bench(args, platform):
    """BASELINE.md config 4: idaHeat2D-style grid DAE, matrix-free SPGMR."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ida_tpu.core.solve import solve as core_solve
    from ida_tpu.core.state import IdaOptions, init_state
    from ida_tpu.models.heat2d import heat2d_problem, heat2d_ic
    from ida_tpu.tol_control import tol_ss

    m = 20 if args.smoke else 100
    prob = heat2d_problem(m, use_prec=True)
    u0, up0 = heat2d_ic(m)
    opts = IdaOptions(linear_solver="spgmr", mxstep=20000)
    tout = 0.16 if not args.smoke else 0.04
    fn = jax.jit(partial(core_solve, problem=prob, opts=opts, tol=tol_ss(1e-5, 1e-8)))

    st = init_state(prob, u0, up0, opts=opts)
    out = fn(st, tout=jnp.asarray(tout))
    _ = np.asarray(out[0].nst)  # compile + sync
    st = init_state(prob, u0, up0, opts=opts)
    t0 = time.perf_counter()
    st, tret, istate = fn(st, tout=jnp.asarray(tout))
    nst = int(np.asarray(st.nst))
    nli = int(np.asarray(st.nli))
    ok = int(np.asarray(istate)) == 0
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"heat2d {m}x{m} SPGMR integrator steps/sec "
                f"(N={prob.n}, f64, {platform})",
                "value": round(nst / dt, 2),
                "unit": "steps/sec",
                "vs_baseline": 1.0 if ok else 0.0,
                "detail": {"nst": nst, "nli": nli, "wall_s": round(dt, 3), "ok": ok},
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-only sanity run")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--f32", action="store_true", help="float32 throughput mode")
    ap.add_argument("--fused", action="store_true",
                    help="whole-solve fused Pallas kernel path (implies f32)")
    ap.add_argument("--tile", type=int, default=1024, help="fused kernel tile")
    ap.add_argument(
        "--problem", default="roberts", choices=["roberts", "heat2d"],
        help="roberts = batched ensemble sweep; heat2d = one large SPGMR system",
    )
    args = ap.parse_args()

    import jax

    # persistent compilation cache: the jitted solve is a large program and
    # the TPU toolchain here compiles slowly; cache across runs/rounds
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    batch = args.batch or (64 if args.smoke else (65536 if platform != "cpu" else 1024))
    dtype = jnp.float32 if args.f32 else jnp.float64

    if args.problem == "heat2d":
        run_heat2d_bench(args, platform)
        return

    # accelerator (or default-platform) ensemble throughput.
    # Watchdog: the axon TPU tunnel can wedge indefinitely (see PERF.md); if
    # the main phase exceeds the budget, fall back to a clearly-labelled CPU
    # smoke measurement in a subprocess so the driver always gets a line.
    import signal
    import subprocess

    def _alarm(signum, frame):
        raise TimeoutError("TPU phase exceeded watchdog budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os_environ_float("IDA_BENCH_WATCHDOG_S", 2400)))
    try:
        t_phase = time.perf_counter()
        if args.fused:
            dtype = jnp.float32
        steps, dt, n_ok, n = run_ensemble(
            batch, args.tout, dtype, fused=args.fused, tile=args.tile
        )
        agg = steps / dt
        f64_phase_s = time.perf_counter() - t_phase
        signal.alarm(0)
    except TimeoutError:
        signal.alarm(0)
        out = subprocess.run(
            [sys.executable, __file__, "--smoke"],
            capture_output=True, text=True, timeout=1200,
        )
        line = ""
        for cand in out.stdout.splitlines():
            if cand.startswith("{"):
                line = cand
        rec = json.loads(line) if line else {"metric": "bench failed", "value": 0.0,
                                             "unit": "steps/sec", "vs_baseline": 0.0}
        rec["metric"] += " [FALLBACK: TPU tunnel unresponsive, CPU smoke numbers]"
        print(json.dumps(rec))
        return

    # f32 throughput mode alongside the f64 headline (TPU-native dtype;
    # every lane still satisfies its own error test). Skipped on smoke and
    # when compiles are slow (remote toolchain): a second compile would
    # double the bench wall time. Reference number: 42.1M steps/s on v5e
    # (9.6x the native serial baseline), see PERF.md.
    f32_agg = None
    if not args.smoke and not args.f32 and not args.fused and f64_phase_s < 240.0:
        try:
            s32, d32, ok32, n32 = run_ensemble(batch, args.tout, jnp.float32)
            if ok32 == n32:
                f32_agg = round(s32 / d32, 1)
        except Exception:
            pass

    # serial CPU IDA baseline: the native C++ oracle (ida_tpu/native),
    # single core, built-in Roberts problem — the same role the reference's
    # sundials-sys FFI oracle plays in its benchmark (benches/dense.rs)
    from ida_tpu.native import oracle_roberts_bench

    touts = [args.tout]
    oracle_roberts_bench(touts, reps=1)  # build/warm
    reps = 50 if args.smoke else 500
    t0 = time.perf_counter()
    osteps, _ = oracle_roberts_bench(touts, reps=reps)
    cpu_rate = osteps / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": f"batched Roberts aggregate integrator steps/sec "
                f"(B={batch}, tout={args.tout:g}, "
                f"{'fused-f32' if args.fused else ('f32' if args.f32 else 'f64')}, "
                f"{platform})",
                "value": round(agg, 1),
                "unit": "steps/sec",
                "vs_baseline": round(agg / cpu_rate, 2),
                "detail": {
                    "batch": batch,
                    "ok_lanes": n_ok,
                    "lanes": n,
                    "total_steps": steps,
                    "wall_s": round(dt, 4),
                    "native_cpu_ida_steps_per_sec": round(cpu_rate, 1),
                    "f32_mode_steps_per_sec": f32_agg,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
