"""Concrete line searches (reference line_search/{Backtracking,Armijo,
RobustArmijo,NoLineSearch}.cpp)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from polysolve_tpu.nonlinear.line_search.base import LineSearch


class Backtracking(LineSearch):
    """Accept on plain energy decrease; when ‖∇f‖ < use_grad_norm_tol the
    criterion switches to gradient-norm decrease (reference
    Backtracking.cpp:15-83)."""

    name_str = "Backtracking"

    def _accept(self, problem, x, new_x, delta_x, step, old_energy,
                new_energy, grad) -> bool:
        if self.use_grad_norm_tol > 0 and \
                np.linalg.norm(grad) < self.use_grad_norm_tol:
            new_grad = problem.gradient(new_x)
            return np.linalg.norm(new_grad) < np.linalg.norm(grad)
        return new_energy < old_energy


class Armijo(LineSearch):
    """Sufficient decrease with c = 1e-4 (reference Armijo.cpp:13-32)."""

    name_str = "Armijo"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.c = float(self.params.get("c", 1e-4))

    def _accept(self, problem, x, new_x, delta_x, step, old_energy,
                new_energy, grad) -> bool:
        return new_energy <= old_energy + self.c * step * float(grad @ delta_x)


class RobustArmijo(Armijo):
    """Armijo with a Zhang–Hager-style approximate-decrease fallback when the
    energy difference is lost to floating-point cancellation:
    if |ΔE| ≤ delta_relative_tolerance·|E_old|, accept when the new
    directional derivative satisfies the approximate Armijo condition
    ∇f(x₁)·Δx ≤ (2c − 1)·∇f(x₀)·Δx (reference RobustArmijo.cpp:16-46)."""

    name_str = "RobustArmijo"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.delta_relative_tolerance = float(
            self.params.get("delta_relative_tolerance", 0.1)
        )

    def _accept(self, problem, x, new_x, delta_x, step, old_energy,
                new_energy, grad) -> bool:
        if super()._accept(problem, x, new_x, delta_x, step, old_energy,
                           new_energy, grad):
            return True
        if abs(new_energy - old_energy) <= \
                self.delta_relative_tolerance * abs(old_energy):
            new_grad = problem.gradient(new_x)
            return float(new_grad @ delta_x) <= \
                (2 * self.c - 1) * float(grad @ delta_x)
        return False


class NoLineSearch(LineSearch):
    """Always take the (nan-checked, CCD-clamped) default step
    (reference NoLineSearch)."""

    name_str = "None"

    def _descent_loop(self, x, delta_x, problem, old_energy, grad,
                      step, min_step, max_iters) -> float:
        new_x = x + step * delta_x
        problem.solution_changed(new_x)
        return step


_METHODS = {
    "Backtracking": Backtracking,
    "Armijo": Armijo,
    "ArmijoAlt": Armijo,  # reference legacy alias
    "RobustArmijo": RobustArmijo,
    "None": NoLineSearch,
    "MoreThuente": RobustArmijo,  # reference removed MoreThuente; map to robust
}


def create_line_search(params: Optional[Dict[str, Any]] = None,
                       logger=None) -> LineSearch:
    params = dict(params or {})
    method = params.get("method", "RobustArmijo")
    if method not in _METHODS:
        raise ValueError(f"Unrecognized line search type: {method}")
    return _METHODS[method](params, logger)
