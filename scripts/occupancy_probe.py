"""Measure lockstep occupancy waste in the headline ensemble: per-lane
attempt counts (nst + netf + ncfn) vs their max — the fraction of masked-idle
lane-iterations the lockstep loop pays for."""

import sys

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from functools import partial
    from ida_tpu.core.solve import solve as core_solve, TASK_NORMAL
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.models import roberts_factory
    from ida_tpu.tol_control import TolControl
    from bench import build

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    tout = 400.0
    dtype = jnp.float64
    states, params, _, _ = build(batch, dtype)
    states_T = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, -1), states)
    prob_T = roberts_factory(jnp.moveaxis(params, 0, -1))
    atol = jnp.asarray([1e-8, 1e-6, 1e-6], dtype)
    tol_T = TolControl(
        rtol=jnp.full((batch,), 1e-4, dtype),
        atol=jnp.tile(atol[:, None], (1, batch)),
    )
    fn = jax.jit(
        partial(core_solve, problem=prob_T, opts=IdaOptions(), tol=tol_T,
                itask=TASK_NORMAL)
    )
    st, tret, istate = fn(states_T, tout=jnp.full((batch,), tout, dtype))
    nst = np.asarray(st.nst)
    att = np.asarray(st.nst + st.netf + st.ncfn)
    for name, v in [("nst", nst), ("attempts", att)]:
        print(
            f"{name}: min={v.min()} mean={v.mean():.1f} max={v.max()} "
            f"occupancy={v.mean() / v.max():.3f}"
        )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
