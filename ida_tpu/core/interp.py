"""Interpolated output from the BDF history (L4).

Behavioural spec: reference ``get_solution`` (src/lib.rs:1274-1343) — evaluate
y(t), y'(t) from the divided-difference array phi and step sums psi — and
``get_dky`` (src/lib.rs:424-529), the general k-th-derivative variant.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from .state import IdaState
from ..utils.ad_mode import smask_den
from ..utils.profiling import scope


def _eps(state):
    """Unit roundoff for the state's dtype (weak scalar: no f64 promotion
    in f32 runs, and f32 runs get f32-appropriate roundoff guards)."""
    return float(jnp.finfo(state.dtype).eps)



def check_t_legal(state: IdaState, t: jax.Array) -> jax.Array:
    """True iff t lies within (fuzzed) [tn - hused, tn] in the direction of
    integration (src/lib.rs:1279-1291)."""
    tfuzz = (
        100.0 * _eps(state) * (jnp.abs(state.tn) + jnp.abs(state.hh)) * jnp.sign(state.hh)
    )
    tp = state.tn - state.hused - tfuzz
    return (t - tp) * state.hh >= 0.0


@scope("get_solution.interpolate")
def interpolate(state: IdaState, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Evaluate (yy, yp) at t from phi/psi without legality checks.

    The cvals/dvals recurrences (src/lib.rs:1301-1314) run unrolled to the
    static order bound with per-index masks on the dynamic ``kord``.
    """
    dtype = state.dtype
    kord = jnp.maximum(state.kused, 1)

    delt = t - state.tn
    # seeds broadcast to the batch shape so the stacked lists stay uniform
    c = jnp.ones_like(delt)
    d = jnp.zeros_like(delt)
    zero = jnp.zeros_like(delt)
    gam = delt / smask_den(state.psi[0])

    # scalarized lists + one stack: no per-element update ops
    cvals = [c] + [zero] * (C.MXORDP1 - 1)
    dvals = [zero] * C.MXORDP1  # dvals[j] multiplies phi[j] in the yp sum
    for j in range(1, C.MXORDP1):
        active = j <= kord
        d_new = d * gam + c / smask_den(state.psi[j - 1])
        c_new = c * gam
        gam_new = (delt + state.psi[j - 1]) / smask_den(state.psi[j])
        c = jnp.where(active, c_new, c)
        d = jnp.where(active, d_new, d)
        gam = jnp.where(active, gam_new, gam)
        cvals[j] = jnp.where(active, c, zero)
        dvals[j] = jnp.where(active, d, zero)

    cvec = jnp.stack(cvals)
    dvec = jnp.stack(dvals)
    bnd = jnp.ndim(kord)
    idx = jnp.arange(C.MXORDP1, dtype=jnp.int32).reshape((C.MXORDP1,) + (1,) * bnd)
    csel = jnp.where(idx <= kord, cvec, 0.0)
    yy = jnp.sum(jnp.expand_dims(csel, 1) * state.phi, axis=0)
    yp = jnp.sum(jnp.expand_dims(dvec, 1) * state.phi, axis=0)
    return yy, yp


def get_solution(state: IdaState, t: jax.Array) -> Tuple[IdaState, jax.Array]:
    """Interpolate into state.yy/state.yp; returns (state, ok). On an illegal
    t the state is unchanged and ok is False (caller maps to BAD_T status)."""
    ok = check_t_legal(state, t)
    yy, yp = interpolate(state, t)
    yy = jnp.where(ok, yy, state.yy)
    yp = jnp.where(ok, yp, state.yp)
    return state._replace(yy=yy, yp=yp), ok


@scope("get_dky")
def get_dky(state: IdaState, t: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """k-th derivative of the interpolating polynomial at t
    (reference src/lib.rs:424-529). ``k`` is static (0 <= k <= kused).

    Returns (dky, ok); ok is False when t is outside the last step or
    k > kused for the lane.
    """
    dtype = state.dtype
    kused = state.kused
    ok = jnp.logical_and(check_t_legal(state, t), k <= kused)

    delt = t - state.tn
    cjk = jnp.zeros(C.MXORDP1, dtype)
    cjk_1 = jnp.zeros(C.MXORDP1, dtype)
    psij_1 = jnp.asarray(0.0, dtype)

    for i in range(0, k + 1):
        if i == 0:
            cjk = cjk.at[0].set(1.0)
        else:
            # c_i^(i) = prod_{j<=i} j / psi_{j-1} (src/lib.rs:486-494)
            cjk = cjk.at[i].set(cjk[i - 1] * i / smask_den(state.psi[i - 1]))
            psij_1 = state.psi[i - 1]
        # update c_j^(i) for j = i+1 ..= kused - k + i (src/lib.rs:499-503)
        for j in range(i + 1, C.MXORDP1):
            active = j <= kused - k + i
            val = (i * cjk_1[j - 1] + cjk[j - 1] * (delt + psij_1)) / smask_den(
                state.psi[j - 1]
            )
            cjk = cjk.at[j].set(jnp.where(active, val, cjk[j]))
            psij_1 = jnp.where(active, state.psi[j - 1], psij_1)
        cjk_1 = cjk

    idx = jnp.arange(C.MXORDP1, dtype=jnp.int32)
    sel = jnp.where(jnp.logical_and(idx >= k, idx <= kused), cjk, 0.0)
    dky = jnp.sum(sel[:, None] * state.phi, axis=0)
    return dky, ok
