"""Pallas batched small-LU kernel: correctness vs the reference-semantics
JAX LU (interpret mode on CPU; the real kernel runs on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ref_solve(a, b):
    from ida_tpu.ops.dense_lu import lu_factor_unrolled, lu_solve_unrolled

    f = jax.vmap(lu_factor_unrolled)(a)
    return jax.vmap(lu_solve_unrolled)(f, b)


@pytest.mark.parametrize("n", [3, 5, 8])
def test_pallas_lu_solve_interpret(n, monkeypatch):
    from jax.experimental import pallas as pl
    import ida_tpu.ops.pallas_lu as mod

    # run the kernel through the Pallas interpreter on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )

    rng = np.random.default_rng(n)
    bsz, tile = 16, 8
    a = rng.normal(size=(bsz, n, n)).astype(np.float32) + 3.0 * np.eye(n, dtype=np.float32)
    b = rng.normal(size=(bsz, n)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    x = mod.pallas_lu_solve(aj, bj, tile_b=tile)
    x_ref = _ref_solve(aj.astype(jnp.float64), bj.astype(jnp.float64))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=1e-5)
    # residual check
    r = np.einsum("bij,bj->bi", a, np.asarray(x)) - b
    assert np.abs(r).max() < 1e-3
