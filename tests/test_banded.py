"""Banded LU factor/solve + AD banded Jacobian (ops/banded.py).

The factor/solve pair is checked against the dense LU (ops/dense_lu.py,
itself pinned to the reference's golden fixtures) on random banded systems
across bandwidth shapes, including the batch-native trailing-batch layout
and the zero-pivot failure lane."""

import numpy as np
import jax.numpy as jnp
import pytest

from ida_tpu.ops.banded import (
    BandLU,
    band_factor,
    band_from_dense,
    band_jacobian,
    band_rows,
    band_solve,
    band_to_dense,
)
from ida_tpu.ops.dense_lu import lu_factor, lu_solve


def _random_banded(n, mu, ml, rng, batch=()):
    a = np.zeros((n, n) + batch)
    for i in range(n):
        lo, hi = max(0, i - ml), min(n, i + mu + 1)
        a[i, lo:hi] = rng.standard_normal((hi - lo,) + batch)
    # diagonal dominance so pivoting stays benign but nonzero
    for i in range(n):
        a[i, i] += 3.0 + np.abs(a[i]).sum(axis=0)
    return jnp.asarray(a)


@pytest.mark.parametrize(
    "n,mu,ml",
    [(5, 1, 1), (8, 2, 1), (8, 1, 3), (12, 0, 2), (12, 3, 0), (9, 4, 4),
     (7, 6, 6)],  # last case: full bandwidth (band == dense)
)
def test_band_vs_dense(n, mu, ml):
    rng = np.random.default_rng(42 + n + 10 * mu + 100 * ml)
    a = _random_banded(n, mu, ml, rng)
    b = jnp.asarray(rng.standard_normal(n))

    ab = band_from_dense(a, mu, ml)
    np.testing.assert_allclose(band_to_dense(ab, mu, ml), a, atol=0)

    f = band_factor(ab, mu, ml)
    assert int(f.fail_col) == 0
    x = band_solve(f, b)
    x_dense = lu_solve(lu_factor(a), b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_dense), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-10)


def test_band_pivoting_actually_pivots():
    # a matrix that NEEDS row swaps: zero diagonal entry with a live
    # subdiagonal (no-pivot elimination would divide by zero)
    a = jnp.asarray(
        [
            [0.0, 2.0, 0.0, 0.0],
            [1.0, 3.0, 1.0, 0.0],
            [0.0, 1.0, 0.0, 2.0],
            [0.0, 0.0, 1.0, 1.0],
        ]
    )
    b = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    f = band_factor(band_from_dense(a, 1, 1), 1, 1)
    assert int(f.fail_col) == 0
    assert int(np.asarray(f.piv)[0]) == 1  # row 0 swapped with row 1
    x = band_solve(f, b)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-12)


def test_band_singular_fail_lane():
    a = jnp.zeros((3, 3)).at[0, 0].set(1.0).at[2, 2].set(1.0)  # col 1 all-zero
    f = band_factor(band_from_dense(a, 1, 1), 1, 1)
    assert int(f.fail_col) == 2  # 1-based first zero pivot


def test_band_batched_trailing():
    n, mu, ml, B = 10, 2, 3, 4
    rng = np.random.default_rng(7)
    a = _random_banded(n, mu, ml, rng, batch=(B,))
    b = jnp.asarray(rng.standard_normal((n, B)))
    ab = band_from_dense(a, mu, ml)
    assert ab.shape == (band_rows(mu, ml), n, B)
    f = band_factor(ab, mu, ml)
    assert f.fail_col.shape == (B,)
    assert not np.asarray(f.fail_col).any()
    x = band_solve(f, b)
    for lane in range(B):
        x1 = band_solve(
            BandLU(
                band_factor(ab[..., lane], mu, ml).lu,
                band_factor(ab[..., lane], mu, ml).piv,
                band_factor(ab[..., lane], mu, ml).fail_col,
                mu, ml,
            ),
            b[:, lane],
        )
        # batched factor/solve == per-lane factor/solve (up to XLA fusion
        # rounding between the two program shapes — the ~1e-14 FMA caveat)
        np.testing.assert_allclose(
            np.asarray(x[:, lane]), np.asarray(x1), rtol=1e-13, atol=1e-15
        )
        np.testing.assert_allclose(
            np.asarray(a[..., lane] @ x[:, lane]), np.asarray(b[:, lane]),
            atol=1e-10,
        )


def test_band_jacobian_exact():
    # nonlinear banded map: tridiagonal coupling
    n = 11

    def fn(y):
        left = jnp.concatenate([y[:1] * 0, y[:-1]])
        right = jnp.concatenate([y[1:], y[-1:] * 0])
        return y**2 + 0.5 * left - 0.25 * right**3

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal(n))
    ab = band_jacobian(fn, y, 1, 1)
    import jax

    j_dense = jax.jacfwd(fn)(y)
    np.testing.assert_allclose(
        np.asarray(band_to_dense(ab, 1, 1)), np.asarray(j_dense),
        rtol=1e-12, atol=1e-14,
    )


def test_band_jacobian_batched():
    n, B = 9, 3

    def fn(y):  # trailing-batch aware elementwise + shift coupling
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]], axis=0)
        return jnp.sin(y) + 0.3 * left

    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal((n, B)))
    ab = band_jacobian(fn, y, 0, 1)
    import jax

    for lane in range(B):
        jd = jax.jacfwd(lambda z: fn(z[:, None])[:, 0])(y[:, lane])
        np.testing.assert_allclose(
            np.asarray(band_to_dense(ab[..., lane], 0, 1)), np.asarray(jd),
            rtol=1e-12, atol=1e-14,
        )
