"""Golden fixtures for the dense LU, captured from reference
crates/linear/src/dense.rs:208-329 (matrices from instrumented Roberts runs).

The Rust fixtures build matrices with ``matrix![rows].transpose()``; here we
write the row data and transpose the same way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu.ops import lu_factor, lu_solve


def test_get_rf1():
    # reference crates/linear/src/dense.rs:267-288
    a = jnp.array(
        [
            [-0.09593473862037126, 0.040000000000000001, 1.0],
            [5274.5976183265557, -5485.2758397300222, 1.0],
            [0.035103714444140913, -0.035103714444140913, 1.0],
        ]
    ).T
    f = lu_factor(a)
    expect = np.array(
        [
            [1.0, 0.040000000000000001, -0.09593473862037126],
            [1.0, -5485.3158397300222, -0.96160252338811314],
            [1.0, -0.075103714444140907, 0.058818531739205995],
        ]
    ).T
    np.testing.assert_allclose(np.asarray(f.lu), expect, rtol=1e-13)
    np.testing.assert_array_equal(np.asarray(f.piv), [2, 1, 2])
    assert int(f.fail_col) == 0


def test_get_rf2():
    # reference crates/linear/src/dense.rs:290-311
    a = jnp.array(
        [
            [-0.042361503587159809, 0.040000000000000001, 1.0],
            [9313.8399601148321, -9331.507477848012, 1.0],
            [0.0029441927049318833, -0.0029441927049318833, 1.0],
        ]
    ).T
    f = lu_factor(a)
    expect = np.array(
        [
            [1.0, 0.040000000000000001, -0.042361503587159809],
            [1.0, -9331.5474778480129, -0.99810694246891751],
            [1.0, -0.042944192704931883, 0.0024427994145761397],
        ]
    ).T
    np.testing.assert_allclose(np.asarray(f.lu), expect, rtol=1e-13)
    np.testing.assert_array_equal(np.asarray(f.piv), [2, 1, 2])


def test_get_rs1():
    # reference crates/linear/src/dense.rs:215-239 (pre-factored LU + pivots)
    from ida_tpu.ops.dense_lu import DenseLU

    lu = jnp.array(
        [
            [1.0, 0.040000000000000001, -0.040655973218655501],
            [1.0, -9562.0329139608493, -0.99881984364015208],
            [1.0, -0.041880782326080723, 0.00070539909027303449],
        ]
    ).T
    b = jnp.array(
        [-0.00000018658722011386564, 0.0000001791760359416981, 0.000000000000015432100042289676]
    )
    piv = jnp.array([2, 1, 2], jnp.int32)
    x = lu_solve(DenseLU(lu, piv, jnp.int32(0)), b)
    expect = np.array(
        [0.000010806109402745275, 0.000000000028591564117644602, -0.000010806137978877292]
    )
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-13)


def test_get_rs2():
    from ida_tpu.ops.dense_lu import DenseLU

    lu = jnp.array(
        [
            [1.0, 0.040000000000000001, -0.041180751793579905],
            [1.0, -9376.8756693193609, -0.99825358822328103],
            [1.0, -0.04272931434962135, 0.0012553747713712066],
        ]
    ).T
    b = jnp.array(
        [-0.00000092446647014019954, 0.0000009098297931611867, 0.000000000000010769163338864018]
    )
    piv = jnp.array([2, 1, 2], jnp.int32)
    x = lu_solve(DenseLU(lu, piv, jnp.int32(0)), b)
    expect = np.array(
        [0.000012924954909363613, -0.000000000038131780122501411, -0.000012924916766814327]
    )
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-13)


def test_dense_4x4():
    # reference crates/linear/src/dense.rs:313-328
    a = jnp.array(
        [
            [5.0, 0.0, 0.0, 1.0],
            [2.0, 2.0, 2.0, 1.0],
            [4.0, 5.0, 5.0, 5.0],
            [1.0, 6.0, 4.0, 5.0],
        ]
    )
    b = jnp.array([9.0, 16.0, 49.0, 45.0])
    f = lu_factor(a)
    x = lu_solve(f, b)
    np.testing.assert_allclose(np.asarray(x), [1.0, 2.0, 3.0, 4.0], rtol=1e-9)


def test_batched_vmap():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (64, 5, 5), jnp.float64) + 5.0 * jnp.eye(5)
    b = jax.random.normal(jax.random.PRNGKey(1), (64, 5), jnp.float64)
    f = jax.vmap(lu_factor)(a)
    x = jax.vmap(lu_solve)(f, b)
    np.testing.assert_allclose(np.einsum("bij,bj->bi", np.asarray(a), np.asarray(x)),
                               np.asarray(b), atol=1e-10)
    assert not np.any(np.asarray(f.fail_col))


def test_singular_reports_column():
    a = jnp.zeros((3, 3)).at[0, 0].set(1.0)
    f = lu_factor(a)
    assert int(f.fail_col) == 2  # 1-based first zero-pivot column
