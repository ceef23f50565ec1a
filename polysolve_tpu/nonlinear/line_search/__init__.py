"""Line-search methods (reference nonlinear/line_search/)."""

from polysolve_tpu.nonlinear.line_search.base import LineSearch  # noqa: F401
from polysolve_tpu.nonlinear.line_search.methods import (  # noqa: F401
    Backtracking,
    Armijo,
    RobustArmijo,
    NoLineSearch,
    create_line_search,
)
