"""Batch-width sweep for the PDE bench legs (BASELINE configs 4/5).

VERDICT r4: foodweb_20x20_batched sits at 1.72x one CPU core at B=32 —
"B=32 suggests nobody pushed occupancy". This probe runs the exact bench
legs at increasing B (and the Krylov precision/storage modes) on the real
chip to find the HBM/occupancy knee, so bench.py can pin its leg widths
to measured numbers.

Usage (ONE TPU job at a time; warm /tmp/ida_tpu_jax_cache first):

    python scripts/pde_bsweep_probe.py foodweb 32 128 512 2048
    python scripts/pde_bsweep_probe.py foodweb-mixed 128 512 2048
    python scripts/pde_bsweep_probe.py heat2d 64 256 512
    python scripts/pde_bsweep_probe.py heat2d-mixed 128 512
"""

import json
import sys


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from bench import run_foodweb_batched, run_heat2d, run_heat2d_batched

    which = sys.argv[1] if len(sys.argv) > 1 else "foodweb"
    widths = [int(b) for b in sys.argv[2:]] or [32, 128, 512]
    for B in widths:
        if which == "foodweb":
            rec = run_foodweb_batched(20, B=B)
        elif which == "foodweb-mixed":
            rec = run_foodweb_batched(20, B=B, ls_precision="single")
        elif which == "foodweb-mixed-bf16":
            rec = run_foodweb_batched(20, B=B, ls_precision="single",
                                      krylov_storage="bfloat16")
        elif which == "heat2d":
            rec = run_heat2d_batched(100, 0.16, B=B)
        elif which == "heat2d-mixed":
            rec = run_heat2d_batched(100, 0.16, B=B, ls_precision="single")
        elif which == "heat2d-single-mixed":
            # B is ignored: the single-instance config-4 leg with the
            # mixed-precision Krylov knobs (VERDICT r4 item 5)
            rec = run_heat2d(100, 0.16, ls_precision="single")
        elif which == "heat2d-single-mixed-bf16":
            rec = run_heat2d(100, 0.16, ls_precision="single",
                             krylov_storage="bfloat16")
        else:
            raise SystemExit(f"unknown probe target {which}")
        rec["probe"] = which
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
