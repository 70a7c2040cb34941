from .dense_lu import lu_factor, lu_solve, DenseLU

__all__ = ["lu_factor", "lu_solve", "DenseLU"]
