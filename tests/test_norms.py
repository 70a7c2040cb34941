"""WRMS norm oracles from reference src/norm_rms.rs:60-87 and
crates/nonlinear/src/norm_wrms.rs:36-68."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import wrms_norm, wrms_norm_masked


def test_norm_wrms():
    # reference src/norm_rms.rs:64-70
    length = 32
    x = jnp.full((length,), -0.5)
    w = jnp.full((length,), 0.5)
    assert float(wrms_norm(x, w)) == 0.25


def test_norm_wrms_masked():
    # reference src/norm_rms.rs:72-86: divide by full N, one element masked
    length = 32
    fac = np.sqrt((length - 1) / length)
    x = jnp.full((length,), -0.5)
    w = jnp.full((length,), 0.5)
    mask = jnp.ones((length,), bool).at[length - 1].set(False)
    np.testing.assert_allclose(float(wrms_norm_masked(x, w, mask)), fac * 0.25, rtol=1e-13)


def test_norm_batched():
    x = jnp.stack([jnp.full((8,), -0.5), jnp.full((8,), 1.0)])
    w = jnp.ones((2, 8))
    out = wrms_norm(x, w)
    np.testing.assert_allclose(np.asarray(out), [0.5, 1.0], rtol=1e-13)


def test_ewt_set():
    from ida_tpu import tol_ss, tol_sv

    y = jnp.array([1.0, -2.0, 0.5])
    ewt = tol_ss(1e-4, 1e-6).ewt_set(y)
    np.testing.assert_allclose(
        np.asarray(ewt), 1.0 / (1e-4 * np.abs(np.asarray(y)) + 1e-6), rtol=1e-13
    )

    atol = jnp.array([1e-8, 1e-6, 1e-6])
    ewt = tol_sv(1e-4, atol).ewt_set(y)
    np.testing.assert_allclose(
        np.asarray(ewt), 1.0 / (1e-4 * np.abs(np.asarray(y)) + np.asarray(atol)), rtol=1e-13
    )
