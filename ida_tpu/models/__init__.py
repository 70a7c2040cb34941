from .roberts import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from .lorenz63 import lorenz63_problem
from .slider_crank import slider_crank_problem

__all__ = [
    "roberts_problem",
    "ROBERTS_YY0",
    "ROBERTS_YP0",
    "lorenz63_problem",
    "slider_crank_problem",
]
