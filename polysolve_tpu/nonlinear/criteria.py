"""Convergence criteria + status state machine
(reference nonlinear/Criteria.{hpp,cpp}).

``check_convergence`` reproduces the reference's precedence exactly
(Criteria.cpp:52-89): iteration limit → gradNorm (measured against
``first_grad_norm_tol`` at iteration 0) → relative xDelta → relative gradNorm
→ Newton decrement → xDelta → fDelta (armed only after ``fdelta_count``
consecutive hits) → xDeltaDotGrad.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class Status(enum.Enum):
    """Solver status (reference Criteria.hpp:12-30 — 14 states)."""

    NOT_STARTED = "NotStarted"
    CONTINUE = "Continue"
    ITERATION_LIMIT = "IterationLimit"
    X_DELTA_TOLERANCE = "XDeltaTolerance"
    F_DELTA_TOLERANCE = "FDeltaTolerance"
    GRAD_NORM_TOLERANCE = "GradNormTolerance"
    FIRST_GRAD_NORM_TOLERANCE = "FirstGradNormTolerance"
    REL_X_DELTA_TOLERANCE = "RelativeXDeltaTolerance"
    REL_GRAD_NORM_TOLERANCE = "RelativeGradNormTolerance"
    NEWTON_DECREMENT_TOLERANCE = "NewtonDecrementTolerance"
    X_DELTA_DOT_GRAD_TOLERANCE = "XDeltaDotGradTolerance"
    OBJECTIVE_CUSTOM_STOP = "ObjectiveCustomStop"
    NAN_ENCOUNTERED = "NanEncountered"
    NOT_DESCENT_DIRECTION = "NotDescentDirection"
    LINE_SEARCH_FAILED = "LineSearchFailed"
    UPDATE_DIRECTION_FAILED = "UpdateDirectionFailed"

    @property
    def is_success(self) -> bool:
        return self in _SUCCESS

    @property
    def is_failure(self) -> bool:
        return self in _FAILURE


_SUCCESS = {
    # reference is_converged_status (Criteria.cpp:10-13); FirstGradNorm is the
    # iteration-0 spelling of GradNormTolerance, ObjectiveCustomStop is a
    # user-requested stop the reference logs as success in the driver.
    Status.X_DELTA_TOLERANCE, Status.F_DELTA_TOLERANCE,
    Status.GRAD_NORM_TOLERANCE, Status.FIRST_GRAD_NORM_TOLERANCE,
    Status.REL_X_DELTA_TOLERANCE, Status.REL_GRAD_NORM_TOLERANCE,
    Status.NEWTON_DECREMENT_TOLERANCE,
    Status.OBJECTIVE_CUSTOM_STOP,
}
_FAILURE = {
    Status.NAN_ENCOUNTERED, Status.NOT_DESCENT_DIRECTION,
    Status.LINE_SEARCH_FAILED, Status.UPDATE_DIRECTION_FAILED,
}


@dataclass
class Criteria:
    """Doubles as the measured state and the threshold set
    (reference Criteria.hpp:34-54)."""

    iterations: int = 0
    x_delta: float = 0.0
    f_delta: float = 0.0
    grad_norm: float = 0.0
    first_grad_norm: float = 0.0
    x_delta_dot_grad: float = 0.0
    rel_x_delta: float = 0.0
    rel_grad_norm: float = 0.0
    newton_decrement: float = 0.0
    f_delta_count: int = 0
    energy: float = float("nan")

    def reset(self) -> None:
        self.iterations = 0
        self.x_delta = self.f_delta = self.grad_norm = 0.0
        self.first_grad_norm = self.x_delta_dot_grad = 0.0
        self.rel_x_delta = self.rel_grad_norm = self.newton_decrement = 0.0
        self.f_delta_count = 0
        self.energy = float("nan")

    def print(self) -> str:
        """Pretty-printer (reference Criteria.cpp:38-50)."""
        return (
            f"iter={self.iterations} f={self.energy:.6g} "
            f"‖∇f‖={self.grad_norm:.3e} Δx={self.x_delta:.3e} "
            f"Δf={self.f_delta:.3e} Δx·∇f={self.x_delta_dot_grad:.3e}"
        )


def check_convergence(state: Criteria, stop: Criteria,
                      fdelta_count_required: int = 0) -> Status:
    """Precedence-ordered convergence test (reference Criteria.cpp:52-89).

    Fields the driver has not measured yet are NaN; every comparison below is
    False for NaN, matching the reference's NaN-out-then-compare protocol
    (Solver.cpp:339-343). The iteration limit uses the reference's strict
    ``>`` (Criteria.cpp:54); the driver separately sets IterationLimit at the
    loop bottom with ``++iterations >= limit`` (Solver.cpp:528-529).
    ``f_delta_count`` is maintained by the driver (Solver.cpp:522), not here.
    """
    if stop.iterations > 0 and state.iterations > stop.iterations:
        return Status.ITERATION_LIMIT
    # gradient test: the (tighter) first_grad_norm threshold applies before
    # the first step (Criteria.cpp:58-62); reference returns GradNormTolerance
    # for both — we keep a distinct spelling for iteration 0, same semantics.
    grad_tol = stop.first_grad_norm if state.iterations == 0 else stop.grad_norm
    if grad_tol > 0 and state.grad_norm < grad_tol:
        return (Status.FIRST_GRAD_NORM_TOLERANCE if state.iterations == 0
                else Status.GRAD_NORM_TOLERANCE)
    if stop.rel_x_delta > 0 and state.rel_x_delta < stop.rel_x_delta:
        return Status.REL_X_DELTA_TOLERANCE
    if stop.rel_grad_norm > 0 and state.rel_grad_norm < stop.rel_grad_norm:
        return Status.REL_GRAD_NORM_TOLERANCE
    if stop.newton_decrement > 0 and state.newton_decrement < stop.newton_decrement:
        return Status.NEWTON_DECREMENT_TOLERANCE
    if stop.x_delta > 0 and state.x_delta < stop.x_delta:
        return Status.X_DELTA_TOLERANCE
    if stop.f_delta > 0 and state.f_delta < stop.f_delta and \
            state.f_delta_count >= fdelta_count_required:
        return Status.F_DELTA_TOLERANCE
    # Δx·∇f > -tol means the direction is (numerically) no longer a descent
    # direction (reference Criteria.cpp:83-88).
    if stop.x_delta_dot_grad < 0 and state.x_delta_dot_grad > stop.x_delta_dot_grad:
        return Status.NOT_DESCENT_DIRECTION
    return Status.CONTINUE
