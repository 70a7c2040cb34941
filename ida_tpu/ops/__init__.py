from .dense_lu import lu_factor, lu_solve, DenseLU
from .banded import (
    BandLU,
    band_factor,
    band_from_dense,
    band_jacobian,
    band_solve,
    band_to_dense,
)
from .bbd import BBDPrec, make_bbd_prec

__all__ = [
    "lu_factor",
    "lu_solve",
    "DenseLU",
    "BandLU",
    "band_factor",
    "band_from_dense",
    "band_jacobian",
    "band_solve",
    "band_to_dense",
    "BBDPrec",
    "make_bbd_prec",
]
