"""Lorenz '63 system in implicit form (exercises stop-test and step/order
control paths).

The reference ships only a stub with an empty residual and no test
(reference ``tests/lorenz63.rs:56-86``, SURVEY.md §2.4); this is the real
system written as a DAE residual F = y' - f(y):

    x' = sigma (y - x)
    y' = x (rho - z) - y
    z' = x y - beta z
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import IdaProblem


def lorenz63_problem(sigma=10.0, rho=28.0, beta=8.0 / 3.0) -> IdaProblem:
    def res(t, yy, yp):
        fx = sigma * (yy[1] - yy[0])
        fy = yy[0] * (rho - yy[2]) - yy[1]
        fz = yy[0] * yy[1] - beta * yy[2]
        return jnp.stack([yp[0] - fx, yp[1] - fy, yp[2] - fz])

    return IdaProblem(n=3, res=res)
