"""Device-mesh sharding of ensembles over ICI.

The ensemble batch axis is embarrassingly parallel: shard it over a 1-D
mesh and XLA runs each shard's lockstep solver locally with zero inner-loop
collectives (norms and convergence tests are per-instance). DCN only enters
for multi-slice ensembles — exactly the layout SURVEY.md §2.2 calls for.
Large single systems (sharded state vectors + SPGMR with psum reductions)
ride the same mesh via the Krylov path (ops/spgmr.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import IdaState


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_ensemble(states: IdaState, mesh: Mesh, axis: str = "batch") -> IdaState:
    """Place a batched IdaState with its leading axis sharded over ``axis``.

    Every leaf of the state has the batch as dim 0, so one PartitionSpec
    covers the whole pytree.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, states)
