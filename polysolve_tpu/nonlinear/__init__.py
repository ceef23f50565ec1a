"""Nonlinear optimization library (the reference's ``polysolve`` nonlinear
half, src/polysolve/nonlinear/): Problem protocol, Criteria state machine,
Solver driver with descent-strategy fallback chains, line searches, and
box-constrained variants."""

from polysolve_tpu.nonlinear.problem import Problem, NormType  # noqa: F401
from polysolve_tpu.nonlinear.criteria import Criteria, Status  # noqa: F401
from polysolve_tpu.nonlinear.post_step import PostStepData  # noqa: F401
from polysolve_tpu.nonlinear.solver import Solver  # noqa: F401
from polysolve_tpu.nonlinear.box_constraint import BoxConstraintSolver  # noqa: F401
