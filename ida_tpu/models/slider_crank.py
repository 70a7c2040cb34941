"""Slider-crank mechanism: stabilized index-2 DAE (GGL formulation), 10 eqs.

Behavioural spec: reference ``src/sample_problems/slider_crank.rs:26-155``
(itself SUNDIALS ``idaSlCrank_dns`` by R. Serban). Jacobian by AD.

State: [q, x, p, qd, xd, pd, lam1, lam2, mu1, mu2].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import IdaProblem


def slider_crank_problem(
    a=0.5, J1=1.0, m2=1.0, J2=2.0, k=1.0, c=1.0, l0=1.0, F=1.0
) -> IdaProblem:
    def force(yy):
        # spring-damper force resolved on the generalized coordinates
        # (reference slider_crank.rs:47-80)
        q, x, p = yy[0], yy[1], yy[2]
        qd, xd, pd = yy[3], yy[4], yy[5]
        s1, c1 = jnp.sin(q), jnp.cos(q)
        s2, c2 = jnp.sin(p), jnp.cos(p)
        s21 = s2 * c1 - c2 * s1
        c21 = c2 * c1 + s2 * s1

        l2 = x * x - x * (c2 + a * c1) + (1.0 + a * a) / 4.0 + a * c21 / 2.0
        l = jnp.sqrt(l2)
        ld = (
            2.0 * x * xd
            - xd * (c2 + a * c1)
            + x * (s2 * pd + a * s1 * qd)
            - a * s21 * (pd - qd) / 2.0
        ) / (2.0 * l)

        f = k * (l - l0) + c * ld
        fl = f / l
        return jnp.stack(
            [
                -fl * a * (s21 / 2.0 + x * s1) / 2.0,
                fl * (c2 / 2.0 - x + a * c1 / 2.0) + F,
                -fl * (x * s2 - a * s21 / 2.0) / 2.0 - F * s2,
            ]
        )

    def res(t, yy, yp):
        # (reference slider_crank.rs:106-154)
        q, x, p = yy[0], yy[1], yy[2]
        qd, xd, pd = yy[3], yy[4], yy[5]
        lam1, lam2 = yy[6], yy[7]
        mu1, mu2 = yy[8], yy[9]
        s1, c1 = jnp.sin(q), jnp.cos(q)
        s2, c2 = jnp.sin(p), jnp.cos(p)
        Q = force(yy)
        return jnp.stack(
            [
                yp[0] - qd + a * s1 * mu1 - a * c1 * mu2,
                yp[1] - xd + mu1,
                yp[2] - pd + s2 * mu1 - c2 * mu2,
                J1 * yp[3] - Q[0] + a * s1 * lam1 - a * c1 * lam2,
                m2 * yp[4] - Q[1] + lam1,
                J2 * yp[5] - Q[2] + s2 * lam1 - c2 * lam2,
                x - c2 - a * c1,
                -s2 - a * s1,
                a * s1 * qd + xd + s2 * pd,
                -a * c1 * qd - c2 * pd,
            ]
        )

    # velocities/positions are differential; lam/mu are algebraic
    ident = jnp.array([True] * 6 + [False] * 4)
    return IdaProblem(n=10, res=res, id=ident)


def slider_crank_ic(a=0.5, J1=1.0, m2=1.0, J2=2.0):
    """Consistent initial conditions (C idaSlCrank_dns setIC): start at rest
    in a constraint-satisfying configuration, with accelerations from the
    applied forces (lambda = mu = 0 at rest). Integrate with
    IdaOptions(suppressalg=True) — index-2 GGL systems require excluding
    the algebraic multipliers from the local error test."""
    import jax.numpy as jnp

    q0 = np.pi / 2.0
    p0 = np.arcsin(-a)
    x0 = np.cos(p0) + a * np.cos(q0)
    yy0 = np.zeros(10)
    yy0[0], yy0[1], yy0[2] = q0, x0, p0
    yp0 = np.zeros(10)
    prob = slider_crank_problem(a=a, J1=J1, m2=m2, J2=J2)
    r0 = np.asarray(prob.res(jnp.asarray(0.0), jnp.asarray(yy0), jnp.asarray(yp0)))
    yp0[3:6] = -r0[3:6] / np.array([J1, m2, J2])
    return yy0, yp0
