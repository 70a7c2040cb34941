"""Headline benchmark: batched Roberts parameter sweep (BASELINE.md config 3).

Measures aggregate integrator throughput — internal BDF steps per second
summed over a vmapped ensemble of Roberts DAE instances with perturbed
chemistry — on whatever accelerator JAX exposes (one TPU chip under the
driver), and compares against a single-instance CPU run of the same solver
(the stand-in for serial CPU IDA, which this build matches step-for-step on
Roberts; see tests/test_roberts_e2e.py::test_canonical_statistics).

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


def run_ensemble(batch, tout, dtype, device=None):
    import jax
    import jax.numpy as jnp
    from ida_tpu.models import roberts_factory
    from ida_tpu.parallel import make_ensemble_solve
    from ida_tpu.tol_control import tol_sv
    from ida_tpu import constants as C

    tol = tol_sv(1.0e-4, jnp.asarray([1e-8, 1e-6, 1e-6], dtype), dtype=dtype)
    solve = make_ensemble_solve(roberts_factory, donate=False)

    ctx = jax.default_device(device) if device is not None else _nullcontext()
    with ctx:
        states, params, _, _ = build(batch, dtype)
        # compile
        out = solve(states, params, tol, jnp.asarray(tout, dtype))
        jax.block_until_ready(out)
        # timed run from fresh states
        states, params, _, _ = build(batch, dtype)
        t0 = time.perf_counter()
        states, tret, istate = solve(states, params, tol, jnp.asarray(tout, dtype))
        jax.block_until_ready((states.nst, tret, istate))
        dt = time.perf_counter() - t0

    nst = np.asarray(states.nst)
    ist = np.asarray(istate)
    ok = ist == C.SUCCESS
    return float(nst.sum()), dt, int(ok.sum()), len(ist)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-only sanity run")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--tout", type=float, default=400.0)
    ap.add_argument("--cpu-ref", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if args.cpu_ref:
        # subprocess mode: single-instance CPU reference (serial-IDA
        # stand-in). Platform must be forced before any backend init.
        jax.config.update("jax_platforms", "cpu")
        steps1, dt1, _, _ = run_ensemble(1, args.tout, jnp.float64)
        print(json.dumps({"cpu_single_steps_per_sec": steps1 / dt1}))
        return

    platform = jax.devices()[0].platform
    batch = args.batch or (64 if args.smoke else (65536 if platform != "cpu" else 1024))
    dtype = jnp.float64

    # accelerator (or default-platform) ensemble throughput
    steps, dt, n_ok, n = run_ensemble(batch, args.tout, dtype)
    agg = steps / dt

    # CPU single-instance reference measured in a clean subprocess (in this
    # environment the axon plugin pins the platform per-process, so an
    # in-process jax.devices('cpu') run does not reflect real CPU throughput)
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--cpu-ref", "--tout", str(args.tout)],
        capture_output=True, text=True, timeout=600,
    )
    cpu_rate = None
    for line in out.stdout.splitlines():
        try:
            cpu_rate = json.loads(line)["cpu_single_steps_per_sec"]
        except (json.JSONDecodeError, KeyError):
            continue
    if cpu_rate is None:
        cpu_rate = float("nan")

    print(
        json.dumps(
            {
                "metric": f"batched Roberts aggregate integrator steps/sec "
                f"(B={batch}, tout={args.tout:g}, f64, {platform})",
                "value": round(agg, 1),
                "unit": "steps/sec",
                "vs_baseline": round(agg / cpu_rate, 2),
                "detail": {
                    "batch": batch,
                    "ok_lanes": n_ok,
                    "lanes": n,
                    "total_steps": steps,
                    "wall_s": round(dt, 3),
                    "cpu_single_steps_per_sec": round(cpu_rate, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
