"""Dense LU with partial pivoting (L2 layer), exact SUNDIALS semantics.

Behavioural spec: reference ``crates/linear/src/dense.rs:86-206``
(``dense_get_rf`` / ``dense_get_rs``, themselves ports of SUNDIALS
``denseGETRF``/``denseGETRS``). The pivot choice (first occurrence of the
column max at-or-below the diagonal) and the elimination order are preserved
so factorizations match the reference's golden fixtures bit-for-bit on
well-posed inputs.

TPU-first design: the factorization is expressed as N rank-1 updates over a
statically-shaped [N, N] matrix inside a ``fori_loop`` — fully vmappable, so
a [B, N, N] ensemble factors in lockstep with no data-dependent shapes. For
Roberts-class problems (N=3..10) this is a handful of fused VPU ops per
instance; batches of thousands saturate the chip. (A Pallas fused
Newton-step kernel for the hot ensemble path lives in ``ops/pallas_lu.py``.)

Failure (zero pivot) is reported as a status lane, not an exception:
``col`` is the 1-based column of the first zero pivot, 0 on success —
mirroring reference ``crates/linear/src/lib.rs:10-13``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DenseLU(NamedTuple):
    """LU factorization PA = LU packed SUNDIALS-style.

    ``lu``: upper triangle (incl. diagonal) is U; strictly-lower part holds
    the multipliers (I - L). ``piv[k]`` is the row swapped with row k at
    elimination step k. ``fail_col`` is 0 on success, else the 1-based column
    index of the first zero pivot.
    """

    lu: jax.Array  # [N, N]
    piv: jax.Array  # [N] int32
    fail_col: jax.Array  # [] int32


def lu_factor(a: jax.Array) -> DenseLU:
    """LU-factor a square matrix, SUNDIALS ``denseGETRF`` order of operations.

    Reference: crates/linear/src/dense.rs:86-158.
    """
    n = a.shape[-1]
    assert a.shape[-2] == n, "lu_factor expects a square matrix"
    idx = jnp.arange(n)

    def step(k, carry):
        mat, piv, fail = carry
        col = mat[:, k]
        # pivot row: first occurrence of max |a[i,k]| for i >= k
        # (the reference scan replaces only on strict '>', i.e. first max wins)
        masked_abs = jnp.where(idx >= k, jnp.abs(col), -jnp.inf)
        l = jnp.argmax(masked_abs).astype(jnp.int32)
        piv = piv.at[k].set(l)
        pivot_val = mat[l, k]
        zero_piv = pivot_val == 0.0
        fail = jnp.where(jnp.logical_and(fail == 0, zero_piv), k + 1, fail)

        # swap full rows k and l (no-op when l == k)
        row_k = mat[k]
        row_l = mat[l]
        mat = mat.at[k].set(row_l).at[l].set(row_k)

        # scale sub-diagonal entries of column k by 1/pivot
        safe_piv = jnp.where(zero_piv, 1.0, mat[k, k])
        mult = 1.0 / safe_piv
        col_k = mat[:, k]
        col_scaled = jnp.where(idx > k, col_k * mult, col_k)
        mat = mat.at[:, k].set(col_scaled)

        # trailing-submatrix rank-1 update: a[i,j] -= a[i,k] * a[k,j]
        update = col_scaled[:, None] * mat[k, :][None, :]
        mask = (idx[:, None] > k) & (idx[None, :] > k)
        mat = mat - jnp.where(mask, update, 0.0)
        return mat, piv, fail

    piv0 = jnp.zeros(n, jnp.int32)
    fail0 = jnp.asarray(0, jnp.int32)
    lu, piv, fail = jax.lax.fori_loop(0, n, step, (a, piv0, fail0))
    return DenseLU(lu, piv, fail)


def lu_factor_unrolled(a: jax.Array) -> DenseLU:
    """Gather/scatter-free LU for small static N (the ensemble hot path).

    Identical arithmetic and pivot choices to :func:`lu_factor` — the same
    multiplies and subtractions in the same order — but row selection and
    swapping are expressed as masked sums/selects over the static row
    index, so under vmap the TPU sees pure elementwise VPU work instead of
    batched dynamic gathers/scatters. Results are bit-identical.
    """
    n = a.shape[-1]
    idx = jnp.arange(n)
    piv = jnp.zeros(n, jnp.int32)
    fail = jnp.asarray(0, jnp.int32)

    for k in range(n):
        col = a[:, k]
        masked_abs = jnp.where(idx >= k, jnp.abs(col), -jnp.inf)
        l = jnp.argmax(masked_abs).astype(jnp.int32)
        piv = piv.at[k].set(l)  # static position write (no scatter)
        # select rows k and l by masked reduction (elementwise, no gather)
        onehot_l = (idx == l).astype(a.dtype)[:, None]
        row_l = jnp.sum(a * onehot_l, axis=0)
        row_k = a[k]  # static index
        pivot_val = row_l[k]
        zero_piv = pivot_val == 0.0
        fail = jnp.where(jnp.logical_and(fail == 0, zero_piv), k + 1, fail)

        # swap rows k and l via selects
        is_k = (idx == k)[:, None]
        is_l = (idx == l)[:, None]
        a = jnp.where(is_k, row_l[None, :], jnp.where(is_l, row_k[None, :], a))

        safe_piv = jnp.where(zero_piv, 1.0, a[k, k])
        mult = 1.0 / safe_piv
        col_k = a[:, k]
        col_scaled = jnp.where(idx > k, col_k * mult, col_k)
        a = a.at[:, k].set(col_scaled)  # static column write

        update = col_scaled[:, None] * a[k, :][None, :]
        mask = (idx[:, None] > k) & (idx[None, :] > k)
        a = a - jnp.where(mask, update, 0.0)

    return DenseLU(a, piv, fail)


def lu_solve_unrolled(f: DenseLU, b: jax.Array) -> jax.Array:
    """Companion solve to :func:`lu_factor_unrolled`: same arithmetic as
    :func:`lu_solve`, permutation applied by masked selects."""
    n = b.shape[-1]
    idx = jnp.arange(n)
    lu, piv = f.lu, f.piv

    for k in range(n):
        pk = piv[k]
        onehot_pk = (idx == pk).astype(b.dtype)
        b_pk = jnp.sum(b * onehot_pk)
        b_k = b[k]
        b = jnp.where(idx == k, b_pk, jnp.where(idx == pk, b_k, b))

    for k in range(n - 1):
        b = b - jnp.where(idx > k, lu[:, k] * b[k], 0.0)

    for k in range(n - 1, 0, -1):
        bk = b[k] / lu[k, k]
        b = b.at[k].set(bk)
        b = b - jnp.where(idx < k, lu[:, k] * bk, 0.0)

    return b.at[0].set(b[0] / lu[0, 0])


# below this size, the unrolled elementwise variant wins on TPU and is
# bit-identical; above it, loop/unroll code size starts to hurt
SMALL_N_UNROLL = 16


def lu_factor_auto(a: jax.Array) -> DenseLU:
    if a.shape[-1] <= SMALL_N_UNROLL:
        return lu_factor_unrolled(a)
    return lu_factor(a)


def lu_solve_auto(f: DenseLU, b: jax.Array) -> jax.Array:
    if b.shape[-1] <= SMALL_N_UNROLL:
        return lu_solve_unrolled(f, b)
    return lu_solve(f, b)


def lu_solve(f: DenseLU, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` from a factorization, SUNDIALS ``denseGETRS`` order.

    Reference: crates/linear/src/dense.rs:165-206. Cannot fail if the
    factorization succeeded.
    """
    n = b.shape[-1]
    idx = jnp.arange(n)
    lu, piv = f.lu, f.piv

    # permute b according to the pivot sequence (inherently sequential)
    def permute(k, bb):
        pk = piv[k]
        bk, bpk = bb[k], bb[pk]
        return bb.at[k].set(bpk).at[pk].set(bk)

    b = jax.lax.fori_loop(0, n, permute, b)

    # forward substitution Ly = b (unit diagonal; multipliers below diag)
    def fwd(k, bb):
        return bb - jnp.where(idx > k, lu[:, k] * bb[k], 0.0)

    b = jax.lax.fori_loop(0, n - 1, fwd, b)

    # back substitution Ux = y, walking k = n-1 .. 1, then b[0] /= a[0,0]
    def bwd(i, bb):
        k = n - 1 - i
        bk = bb[k] / lu[k, k]
        bb = bb.at[k].set(bk)
        return bb - jnp.where(idx < k, lu[:, k] * bk, 0.0)

    b = jax.lax.fori_loop(0, n - 1, bwd, b)
    return b.at[0].set(b[0] / lu[0, 0])
