"""Descent strategies (reference nonlinear/descent_strategies/)."""

from polysolve_tpu.nonlinear.descent.base import DescentStrategy  # noqa: F401
from polysolve_tpu.nonlinear.descent.gradient import (  # noqa: F401
    GradientDescent,
    StochasticGradientDescent,
    ADAM,
    StochasticADAM,
)
from polysolve_tpu.nonlinear.descent.quasi_newton import BFGS, LBFGS  # noqa: F401
from polysolve_tpu.nonlinear.descent.newton import (  # noqa: F401
    Newton,
    DenseNewton,
    ProjectedNewton,
    RegularizedNewton,
    RegularizedProjectedNewton,
    DenseProjectedNewton,
    DenseRegularizedNewton,
    DenseRegularizedProjectedNewton,
)

STRATEGIES = {
    "GradientDescent": GradientDescent,
    "StochasticGradientDescent": StochasticGradientDescent,
    "ADAM": ADAM,
    "StochasticADAM": StochasticADAM,
    "BFGS": BFGS,
    "L-BFGS": LBFGS,
    "LBFGS": LBFGS,
    "Newton": Newton,
    "DenseNewton": DenseNewton,
    "ProjectedNewton": ProjectedNewton,
    "RegularizedNewton": RegularizedNewton,
    "RegularizedProjectedNewton": RegularizedProjectedNewton,
    "DenseProjectedNewton": DenseProjectedNewton,
    "DenseRegularizedNewton": DenseRegularizedNewton,
    "DenseRegularizedProjectedNewton": DenseRegularizedProjectedNewton,
}
