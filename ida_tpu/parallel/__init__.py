from .batch import EnsembleIDA, ensemble_init, make_ensemble_solve
from .mesh import make_mesh, shard_ensemble

__all__ = [
    "EnsembleIDA",
    "ensemble_init",
    "make_ensemble_solve",
    "make_mesh",
    "shard_ensemble",
]
