"""Isolated timing of the solver's two hottest fusion patterns, to pick the
fastest formulation (values bit-identical across variants by construction).

1. attempt_norms: 3 dynamic phi-row picks + 4 WRMS norms
   (a) stacked one-hot masked sum (one phi pass, strided reduce)
   (b) three separate take_row passes
2. predict: two masked phi sums
   (a) two jnp.sum calls  (b) one stacked sum producing both
"""

import sys
import time

import numpy as np

ITERS = 200


def main():
    import ida_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
    B = 262144
    K1, N = 6, 3
    key = jax.random.PRNGKey(0)
    phi = jax.random.uniform(key, (K1, N, B), jnp.float64)
    ee = jax.random.uniform(key, (N, B), jnp.float64)
    ewt = jax.random.uniform(key, (N, B), jnp.float64) + 0.5
    kk = jnp.full((B,), 3, jnp.int32)
    gamma = jax.random.uniform(key, (K1, B), jnp.float64)

    def tiny(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:4])

    def bench(name, fn, x):
        f = jax.jit(lambda x: lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
        _ = tiny(f(x))
        t0 = time.perf_counter()
        _ = tiny(f(x))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:28s} {dt*1e6:8.1f} us/iter")

    def wrms(x):
        return jnp.sqrt(jnp.sum(jnp.square(x * ewt), axis=0) / N)

    def norms_stacked(a):
        kp1 = jnp.minimum(kk + 1, K1 - 1)
        idx3 = jnp.stack([kk, jnp.maximum(kk - 1, 0), kp1])
        iota = jax.lax.broadcasted_iota(jnp.int32, (3, K1, 1, 1), 1)
        oh = iota == idx3.reshape((3, 1, 1, B))
        rows = jnp.sum(jnp.where(oh, a[None], 0.0), axis=1)
        d1 = rows[0] + ee
        d2 = d1 + rows[1]
        dk = ee - rows[2]
        s = wrms(ee) + wrms(d1) + wrms(d2) + wrms(dk)
        return a + 1e-30 * s

    def take_row(mat, idx):
        oh = jax.lax.broadcasted_iota(jnp.int32, (K1, 1, 1), 0) == idx
        return jnp.sum(jnp.where(oh, mat, 0.0), axis=0)

    def norms_takerow(a):
        kp1 = jnp.minimum(kk + 1, K1 - 1)
        r0 = take_row(a, kk)
        r1 = take_row(a, jnp.maximum(kk - 1, 0))
        r2 = take_row(a, kp1)
        d1 = r0 + ee
        d2 = d1 + r1
        dk = ee - r2
        s = wrms(ee) + wrms(d1) + wrms(d2) + wrms(dk)
        return a + 1e-30 * s

    bench("norms stacked 3-row", norms_stacked, phi)
    bench("norms 3x take_row", norms_takerow, phi)

    idx = jnp.arange(K1, dtype=jnp.int32).reshape((K1, 1))

    def pred_two(a):
        yym = (idx <= kk).astype(a.dtype)
        yy = jnp.sum(a * yym[:, None, :], axis=0)
        ypc = jnp.where(jnp.logical_and(idx >= 1, idx <= kk), gamma, 0.0)
        yp = jnp.sum(a * ypc[:, None, :], axis=0)
        return a + 1e-30 * (yy + yp)

    def pred_stacked(a):
        yym = (idx <= kk).astype(a.dtype)
        ypc = jnp.where(jnp.logical_and(idx >= 1, idx <= kk), gamma, 0.0)
        w = jnp.stack([yym, ypc])  # [2, K1, B]
        both = jnp.sum(a[None] * w[:, :, None, :], axis=1)  # [2, N, B]
        return a + 1e-30 * (both[0] + both[1])

    bench("predict two sums", pred_two, phi)
    bench("predict stacked sum", pred_stacked, phi)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
