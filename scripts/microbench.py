"""Microbenchmarks calibrating achievable TPU f64 bandwidth against what the
solver's hot fusions get. Every leg loops ITERS times on device inside one
jit call (single dispatch — the axon tunnel costs ~10ms per host call)."""

import sys
import time

import numpy as np


ITERS = 300


def main():
    import ida_tpu  # noqa: F401  (enables x64)
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
    B = 262144
    K1, N = 6, 3
    key = jax.random.PRNGKey(0)
    phi = jax.random.uniform(key, (K1, N, B), jnp.float64)
    gamma = jax.random.uniform(key, (K1, B), jnp.float64)
    kk = jnp.full((B,), 3, jnp.int32)
    s = jax.random.uniform(key, (B,), jnp.float64)

    def tiny(out):
        # sync via a dependent TINY transfer: fetching the whole result
        # through the axon tunnel runs at ~20 MB/s and would dominate
        leaf = jax.tree_util.tree_leaves(out)[0]
        flat = leaf.reshape(-1)[:4]
        return np.asarray(flat)

    def bench(name, fn, x, bytes_per_iter):
        f = jax.jit(lambda x: lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
        _ = tiny(f(x))  # compile+sync
        t0 = time.perf_counter()
        _ = tiny(f(x))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:22s} {dt*1e6:8.1f} us/iter  {bytes_per_iter/dt/1e9:7.1f} GB/s")

    mb = lambda *arrs: sum(a.size * a.dtype.itemsize for a in arrs)

    # tunnel transfer rate calibration
    for sz_mb in (2, 32):
        arr = jnp.ones((sz_mb * 131072,), jnp.float64)
        _ = np.asarray(arr)
        t0 = time.perf_counter()
        _ = np.asarray(arr)
        dt = time.perf_counter() - t0
        print(f"host fetch {sz_mb:3d} MB      {dt*1e3:8.1f} ms      {sz_mb/1e3/dt:7.2f} GB/s")

    # pure elementwise r+w of phi
    bench("phi *1.0000001", lambda a: a * 1.0000001, phi, 2 * mb(phi))

    big = jax.random.uniform(key, (32 * 1024 * 1024,), jnp.float64)  # 256MB
    bench("256MB *1.0000001", lambda a: a * 1.0000001, big, 2 * mb(big))
    bigf = big.astype(jnp.float32)
    bench("128MB f32 *1.0001", lambda a: a * 1.0001, bigf, 2 * mb(bigf))

    # predict-shaped: two masked phi sums, result folded back into carry
    idx = jnp.arange(K1, dtype=jnp.int32).reshape((K1, 1))

    def predict_like(a):
        yym = (idx <= kk).astype(a.dtype)
        yy = jnp.sum(a * yym[:, None, :], axis=0)
        ypc = jnp.where(jnp.logical_and(idx >= 1, idx <= kk), gamma, 0.0)
        yp = jnp.sum(a * ypc[:, None, :], axis=0)
        return a + 1e-12 * (yy + yp)[None]

    bench("predict2sum+upd", predict_like, phi, 3 * mb(phi) + 0)

    # one plain sum over axis 0, fed back
    bench("phi sum0+upd", lambda a: a + 1e-12 * jnp.sum(a, axis=0)[None],
          phi, 3 * mb(phi))

    # scalar [B] transcendental chain
    bench("[B] pow chain", lambda a: 0.9 * (2.0 * a + 1e-4) ** (-1.0 / 3.0),
          s, 2 * mb(s))

    # [B] -> scalar any, fed back (while-cond shape)
    bench("[B] any+upd", lambda a: a + jnp.any(a > 1e30).astype(a.dtype), s,
          mb(s))

    # co-tiling shape test: one [30,B] op vs thirty [B] ops
    sc = jax.random.uniform(key, (30, B), jnp.float64)
    bench("[30,B] mul+add", lambda a: a * 1.0000001 + 1e-30, sc, 2 * mb(sc))
    rows = [jax.random.uniform(jax.random.PRNGKey(i), (B,), jnp.float64)
            for i in range(30)]
    def thirty(a_tuple):
        return tuple(a * 1.0000001 + 1e-30 for a in a_tuple)
    bench("30x [B] mul+add", thirty, tuple(rows), 2 * mb(*rows))
    # a single [B] op for the fixed-cost floor
    bench("[B] mul+add", lambda a: a * 1.0000001 + 1e-30, s, 2 * mb(s))
    # 2-D reshape of the same scalar row
    s2 = s.reshape(512, 512)
    bench("[512,512] mul+add", lambda a: a * 1.0000001 + 1e-30, s2, 2 * mb(s2))

    # fixed-cost attribution: k forced-separate kernels per iteration
    def chain(k):
        def f(a):
            for _ in range(k):
                a = lax.optimization_barrier(a * 1.0000001)
            return a
        return f
    for k in (1, 2, 4, 8, 16):
        bench(f"[B] x{k} barrier-split", chain(k), s, 2 * mb(s) * k)

    # wrms over the N axis of [N,B]
    v = jax.random.uniform(key, (N, B), jnp.float64)
    bench("wrms[N,B]+upd",
          lambda a: a + 1e-12 * jnp.sqrt(jnp.sum(jnp.square(a), axis=0) / N),
          v, 3 * mb(v))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
