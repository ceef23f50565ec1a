"""Linear-solver library (the reference's ``polysolve_linear``,
src/polysolve/linear/): facade + registry, Krylov family, AMG, direct
factorizations, saddle-point solver, FEM helpers."""

from polysolve_tpu.linear.solver import (  # noqa: F401
    Solver,
    available_solvers,
    available_preconds,
    default_solver,
    default_precond,
    register_solver,
)
from polysolve_tpu.linear import iterative  # noqa: F401
from polysolve_tpu.linear import dense  # noqa: F401
from polysolve_tpu.linear import direct  # noqa: F401
from polysolve_tpu.linear import amg  # noqa: F401
from polysolve_tpu.linear import mas  # noqa: F401
from polysolve_tpu.linear import saddle_point  # noqa: F401
from polysolve_tpu.linear.fem import (  # noqa: F401
    dirichlet_solve,
    prefactorize,
    dirichlet_solve_prefactorized,
)
