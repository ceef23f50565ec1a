"""Descent-strategy ABC (reference descent_strategies/DescentStrategy.hpp:10-55)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


class DescentStrategy:
    """One entry in the solver's fallback chain. Contract:

    - ``compute_update_direction(problem, x, grad) -> direction | None``
      (None or a NaN direction = strategy failure → the driver advances to
      the next strategy, reference Solver.cpp:367-386);
    - ``handle_error()`` lets the strategy adapt before being retried
      (RegularizedNewton escalates its regularization, Newton.cpp:326-330);
    - ``reset(ndof)`` clears per-run state;
    - ``is_direction_descent()`` — whether d·∇f < 0 is guaranteed.
    """

    name_str = "DescentStrategy"

    def __init__(self, params: Optional[Dict[str, Any]] = None, logger=None):
        self.params = dict(params or {})
        self.logger = logger
        self.info: Dict[str, Any] = {}

    def name(self) -> str:
        return self.name_str

    def reset(self, ndof: int) -> None:
        pass

    def reset_times(self) -> None:
        self.info = {}

    def is_direction_descent(self) -> bool:
        return True

    def handle_error(self) -> bool:
        """Return True if the strategy changed something and deserves a retry
        within the same outer iteration (reference handle_error)."""
        return False

    def compute_update_direction(self, problem, x: np.ndarray,
                                 grad: np.ndarray) -> Optional[np.ndarray]:
        raise NotImplementedError

    def update_solution(self, x: np.ndarray, grad: np.ndarray) -> None:
        """Called after a successful step (quasi-Newton history updates)."""
