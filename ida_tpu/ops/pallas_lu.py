"""Pallas TPU kernel: batched small-N LU factor + solve in VMEM.

The ensemble hot path factors/solves [B, N, N] systems with N in 3..16 —
far below MXU tile sizes, so the win is not matmul throughput but keeping
the whole factor+solve chain in VMEM as one kernel: one HBM read of (A, b),
one HBM write of x, no intermediate roundtrips between the ~N^2 tiny HLO
ops the unrolled jnp version emits.

Layout: lanes ride the TPU lane dimension (128-wide); the N x N matrix is
unrolled into N*N separate [TILE_B]-vectors (struct-of-arrays), so every
operation is a full-width VPU op over the batch. Pivoting uses the same
first-max rule as ops.dense_lu (select-based, no gathers).

float32 only (Mosaic has no f64); used by the throughput/f32 ensemble mode.
The f64 parity path keeps the pure-JAX unrolled kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lu_solve_kernel(n: int, a_ref, b_ref, x_ref):
    """One fused LU factor + solve per lane. a_ref: [TB, N, N] viewed as
    rows of lane-vectors; b_ref/x_ref: [TB, N]."""
    # load as struct-of-arrays: a[i][j] is a [TB] vector
    a = [[a_ref[:, i, j] for j in range(n)] for i in range(n)]
    b = [b_ref[:, i] for i in range(n)]

    for k in range(n):
        # pivot row l = first max |a[i][k]| for i >= k (per lane)
        best = jnp.abs(a[k][k])
        lsel = jnp.zeros_like(best, dtype=jnp.int32) + k
        for i in range(k + 1, n):
            cand = jnp.abs(a[i][k])
            take = cand > best
            best = jnp.where(take, cand, best)
            lsel = jnp.where(take, i, lsel)

        # swap rows k and l (per-lane select), same for b
        for j in range(n):
            akj = a[k][j]
            # value at the pivot row: select over i >= k
            alj = akj
            for i in range(k + 1, n):
                alj = jnp.where(lsel == i, a[i][j], alj)
            a[k][j] = alj
            for i in range(k + 1, n):
                a[i][j] = jnp.where(lsel == i, akj, a[i][j])
        bk = b[k]
        blv = bk
        for i in range(k + 1, n):
            blv = jnp.where(lsel == i, b[i], blv)
        b[k] = blv
        for i in range(k + 1, n):
            b[i] = jnp.where(lsel == i, bk, b[i])

        # eliminate below the diagonal; fold the b update in immediately
        # (Doolittle step fused with forward substitution)
        inv = 1.0 / a[k][k]
        for i in range(k + 1, n):
            m = a[i][k] * inv
            a[i][k] = m
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - m * a[k][j]
            b[i] = b[i] - m * b[k]

    # back substitution
    for k in range(n - 1, -1, -1):
        acc = b[k]
        for j in range(k + 1, n):
            acc = acc - a[k][j] * b[j]
        b[k] = acc / a[k][k]

    for i in range(n):
        x_ref[:, i] = b[i]


@functools.partial(jax.jit, static_argnames=("tile_b",))
def pallas_lu_solve(a: jax.Array, b: jax.Array, *, tile_b: int = 512) -> jax.Array:
    """Solve a batch of small dense systems A x = b in one fused TPU kernel.

    a: [B, N, N] float32, b: [B, N] float32; B must be a multiple of tile_b
    (pad the batch — ensemble batches are powers of two anyway).
    """
    bsz, n, _ = a.shape
    assert a.dtype == jnp.float32 and b.dtype == jnp.float32, "Pallas path is f32"
    assert bsz % tile_b == 0, f"batch {bsz} not a multiple of tile {tile_b}"
    grid = (bsz // tile_b,)
    kernel = functools.partial(_lu_solve_kernel, n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(a, b)
