from .batch import EnsembleIDA, ensemble_init, make_ensemble_solve
from .mesh import (
    make_mesh,
    make_mesh_2d,
    shard_ensemble,
    shard_ensemble_2d,
    shard_state_vector,
)

__all__ = [
    "EnsembleIDA",
    "ensemble_init",
    "make_ensemble_solve",
    "make_mesh",
    "make_mesh_2d",
    "shard_ensemble",
    "shard_ensemble_2d",
    "shard_state_vector",
]
