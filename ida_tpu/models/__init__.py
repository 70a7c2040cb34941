from .roberts import roberts_problem, roberts_factory, ROBERTS_YY0, ROBERTS_YP0, ROBERTS_PARAMS
from .lorenz63 import lorenz63_problem
from .slider_crank import slider_crank_problem
from .heat2d import heat2d_problem, heat2d_ic
from .foodweb import foodweb_problem, foodweb_ic

__all__ = [
    "roberts_problem",
    "roberts_factory",
    "ROBERTS_PARAMS",
    "ROBERTS_YY0",
    "ROBERTS_YP0",
    "lorenz63_problem",
    "slider_crank_problem",
    "heat2d_problem",
    "heat2d_ic",
    "foodweb_problem",
    "foodweb_ic",
]
