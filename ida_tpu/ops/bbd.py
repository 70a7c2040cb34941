"""Band-block-diagonal preconditioner for the Krylov path (IDABBDPRE).

The C IDA companion module IDABBDPRE builds, per MPI rank, a BANDED
difference-quotient approximation of the local Jacobian and uses its LU as
the SPGMR preconditioner. The reference never ported it (its Krylov path is
entirely stubbed, ida_ls.rs:70-96); this is the TPU-native equivalent,
built on ops/banded.py:

* the "local block" is the full on-chip state (single-system case) or each
  lane of a trailing-batch ensemble (every lane preconditions itself — the
  block-diagonal structure over the batch axis is free by construction);
* the banded Jacobian is EXACT (Curtis-Powell-Reid-colored jvp probes,
  band_jacobian) rather than the C module's difference quotients —
  mu+ml+1 jvp evaluations of the (optionally simplified) local residual;
* ``res_local`` plays the role of IDABBDPRE's ``Gres``: a cheaper /
  sparser approximation of the residual used only inside the
  preconditioner (defaults to the problem residual itself, the common
  usage in the SUNDIALS examples).

Usage::

    prec = make_bbd_prec(res, n, mu, ml)   # res_local=... for a cheaper Gres
    prob = IdaProblem(n=n, res=res, **prec.hooks())
    opts = IdaOptions(linear_solver="spgmr")
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from .banded import BandLU, band_factor, band_jacobian, band_rows, band_solve


class BBDPrec(NamedTuple):
    """Factory output: the three IdaProblem preconditioner hooks, with the
    (static) bandwidths captured in the closures so the pdata pytree holds
    only arrays (it is threaded through traced loop carries)."""

    n: int
    mu: int
    ml: int
    prec_setup: Callable
    prec_solve: Callable
    prec_zero: Callable

    def hooks(self) -> dict:
        """Keyword arguments for IdaProblem(...)."""
        return dict(
            prec_setup=self.prec_setup,
            prec_solve=self.prec_solve,
            prec_zero=self.prec_zero,
        )


def make_bbd_prec(
    res: Callable,
    n: int,
    mu: int,
    ml: int,
    *,
    res_local: Optional[Callable] = None,
    dtype=jnp.float64,
) -> BBDPrec:
    """Build IDABBDPRE-style hooks.

    ``res``: the problem residual ``res(t, yy, yp)`` (trailing-batch aware,
    like every IdaProblem callback). ``res_local``: optional cheaper
    residual used only for the preconditioner band (IDABBDPRE's Gres).
    ``mu``/``ml``: KEPT half-bandwidths of the preconditioner band — may be
    (much) smaller than the true Jacobian bandwidth; the preconditioner
    only needs to capture the stiff local coupling (IDABBDPRE's
    mukeep/mlkeep)."""
    g = res_local if res_local is not None else res
    rows = band_rows(mu, ml)

    def prec_setup(t, cj, yy, yp, rr):
        def f_of_e(e):
            return g(t, yy + e, yp + cj * e)

        ab = band_jacobian(f_of_e, jnp.zeros_like(yy), mu, ml)
        f = band_factor(ab, mu, ml)
        # arrays only — the static bandwidths live in the closure
        return (f.lu, f.piv)

    def prec_solve(pdata, r, cj):
        lu, piv = pdata
        f = BandLU(lu, piv.astype(jnp.int32), jnp.zeros((), jnp.int32), mu, ml)
        return band_solve(f, r.astype(lu.dtype)).astype(r.dtype)

    def prec_zero():
        return (jnp.zeros((rows, n), dtype), jnp.zeros((n,), jnp.int32))

    return BBDPrec(n, mu, ml, prec_setup, prec_solve, prec_zero)
