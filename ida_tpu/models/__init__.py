from .roberts import roberts_problem, roberts_factory, ROBERTS_YY0, ROBERTS_YP0, ROBERTS_PARAMS
from .lorenz63 import lorenz63_problem
from .slider_crank import slider_crank_problem

__all__ = [
    "roberts_problem",
    "roberts_factory",
    "ROBERTS_PARAMS",
    "ROBERTS_YY0",
    "ROBERTS_YP0",
    "lorenz63_problem",
    "slider_crank_problem",
]
