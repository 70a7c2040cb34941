"""Per-lane traced options (the reason hin/hmax/tstop live in the state,
not the static options) and the maxord cap."""

import jax
import jax.numpy as jnp
import numpy as np

from ida_tpu import constants as C
from ida_tpu import IDA, IdaOptions, IdaSolveStatus
from ida_tpu.models import roberts_factory, roberts_problem, ROBERTS_PARAMS, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.parallel import EnsembleIDA
from ida_tpu.tol_control import tol_sv


def _tol():
    return tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))


def test_maxord_cap():
    # identical run but capped at order 2: more steps, never k > 2
    ida5 = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, _tol())
    ida5.solve(400.0)
    ida2 = IDA(
        roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, _tol(),
        options=IdaOptions(maxord=2),
    )
    ida2.solve(400.0)
    assert ida2.get_last_order() <= 2
    assert ida2.get_num_steps() > ida5.get_num_steps()
    # same answer within tolerance
    np.testing.assert_allclose(ida2.get_yy(), ida5.get_yy(), rtol=1e-3)


def test_per_lane_tstop_and_hmax():
    b = 4
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (b, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    yp0 = jnp.tile(jnp.asarray(ROBERTS_YP0), (b, 1))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, _tol())

    # heterogeneous per-lane settings straight into the batched state:
    # lane 0/1 have tstop short of tout; lane 2 has a tight hmax; lane 3 free
    tstops = jnp.asarray([0.1, 0.2, 0.0, 0.0])
    ens.states = ens.states._replace(
        tstop=tstops,
        tstop_set=jnp.asarray([True, True, False, False]),
        hmax_inv=jnp.asarray([0.0, 0.0, 1.0 / 1e-3, 0.0]),
    )
    tret, istate = ens.solve(0.4)

    assert istate[0] == C.TSTOP_RETURN and np.isclose(tret[0], 0.1)
    assert istate[1] == C.TSTOP_RETURN and np.isclose(tret[1], 0.2)
    assert istate[2] == C.SUCCESS and np.isclose(tret[2], 0.4)
    assert istate[3] == C.SUCCESS and np.isclose(tret[3], 0.4)
    # the hmax-capped lane needed many more steps than the free lane
    nst = np.asarray(ens.states.nst)
    assert nst[2] > 3 * nst[3]
