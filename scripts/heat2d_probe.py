"""heat2d single-instance latency probe (VERDICT r4 item 5).

BASELINE.md config 4 (one 100x100 grid DAE, matrix-free SPGMR) measured
0.89x one CPU core in f64 at round 4 — a single N=1e4 system leaves the
chip idle and pays f64 emulation on every tiny op in the (fully fused,
single-dispatch) solve loop. This probe A/Bs the candidate levers from
VERDICT r4 item 5 on the chip:

  * ls_precision="single"  — whole Krylov iteration in f32 (native on
    v5e; the f64 error test still gates every step)
  * krylov_maxl sweep      — fewer restarts (each restart pays 2 extra
    atimes + a true-residual recompute) vs more MGS dots per cycle
  * gs="classical"         — CGS2 Arnoldi: j sequential MGS dots become
    2 batched V-matmuls per iteration (shorter dependency chain for the
    latency-bound single instance)

Usage: python scripts/heat2d_probe.py  (needs the axon TPU; each leg
prints one JSON line, bench.run_heat2d format + config keys).
"""

import json

CONFIGS = [
    # (label, kwargs for bench.run_heat2d)
    ("f64_baseline", {}),
    ("f64_cgs", {"krylov_gs": "classical"}),
    ("mixed_single", {"ls_precision": "single"}),
    ("mixed_single_cgs", {"ls_precision": "single",
                          "krylov_gs": "classical"}),
]


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from bench import run_heat2d

    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    for label, kw in CONFIGS:
        try:
            rec = run_heat2d(100, 0.16, **kw)
            rec["config"] = label
        except Exception as e:  # keep sweeping past a broken leg
            rec = {"config": label, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
