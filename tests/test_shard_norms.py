"""Explicit collective WRMS norms under shard_map (SURVEY.md §2.2 item 3:
psum-based reductions for sharded states)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ida_tpu.norms import wrms_norm, wrms_norm_masked


def test_wrms_psum_shard_map():
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("x",))
    n = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=n))
    w = jnp.asarray(1.0 / (np.abs(rng.normal(size=n)) + 1.0))
    mask = jnp.asarray(rng.uniform(size=n) > 0.3)

    @jax.jit
    def sharded_norms(x, w, mask):
        def f(xs, ws, ms):
            return (
                wrms_norm(xs, ws, axis_name="x"),
                wrms_norm_masked(xs, ws, ms, axis_name="x"),
            )

        return jax.shard_map(
            f, mesh=mesh, in_specs=(P("x"), P("x"), P("x")),
            out_specs=(P(), P()),
        )(x, w, mask)

    n1, n2 = sharded_norms(x, w, mask)
    np.testing.assert_allclose(float(n1), float(wrms_norm(x, w)), rtol=1e-12)
    np.testing.assert_allclose(
        float(n2), float(wrms_norm_masked(x, w, mask)), rtol=1e-12
    )
