"""Newton-family strategies (reference descent_strategies/Newton.cpp).

The family mirrors the reference variants and their fallback roles
(Newton.cpp:14-58 builds the chain [Newton → ProjectedNewton →
RegularizedNewton] + GradientDescent):

- ``Newton``             — solve H Δx = −∇f with the linear stack; reject if
  the linear residual exceeds ``residual_tolerance`` or is NaN
  (Newton.cpp:144-254, acceptance threshold spec default 1e-5);
- ``DenseNewton``        — force the dense path;
- ``ProjectedNewton``    — sets the problem's project-to-PSD flag so element
  Hessians are eigenvalue-clamped (Newton.cpp:266-273); dense Hessians are
  clamped here directly;
- ``RegularizedNewton``  — H + w·I with w escalating ×10 up to 1e8 in
  ``handle_error`` (Newton.cpp:275-330).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp

from polysolve_tpu.linear.solver import Solver as LinearSolver
from polysolve_tpu.nonlinear.descent.base import DescentStrategy


class Newton(DescentStrategy):
    name_str = "Newton"
    force_dense = False

    def __init__(self, params=None, logger=None, linear_solver_params=None,
                 characteristic_length: float = 1.0):
        super().__init__(params, logger)
        self.residual_tolerance = float(self.params.get("residual_tolerance", 1e-5))
        self.characteristic_length = characteristic_length
        self.linear_solver_params = linear_solver_params or {}
        self._linear: Optional[LinearSolver] = None
        self._internal_info = []

    def _make_linear_solver(self) -> LinearSolver:
        # Newton owns a linear solver (reference Newton.cpp:70)
        return LinearSolver.create(dict(self.linear_solver_params),
                                   logger=self.logger, strict=False)

    def reset(self, ndof: int) -> None:
        self._linear = None
        self._internal_info = []

    def _assemble(self, problem, x) -> Any:
        H = problem.hessian(x)
        if self.force_dense and sp.issparse(H):
            H = H.toarray()
        return H

    def _regularize(self, H):
        return H

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        H = self._assemble(problem, x)
        if not sp.issparse(H):
            H = np.asarray(H)
            if problem.project_to_psd:
                # eigenvalue clamp (the dense analog of per-element PSD
                # projection, Newton.cpp:257-291); the floor is kept at a
                # small *relative* scale so the projected system stays
                # well-conditioned
                w, V = np.linalg.eigh(0.5 * (H + H.T))
                w = np.maximum(w, 1e-8 * max(np.abs(w).max(), 1.0))
                H = (V * w) @ V.T
        H = self._regularize(H)

        try:
            if self._linear is None:
                self._linear = self._make_linear_solver()
            if sp.issparse(H):
                Hc = sp.csr_matrix(H)
                self._linear.analyze_pattern(Hc, Hc.shape[0])
                self._linear.factorize(Hc)
            else:
                self._linear.analyze_pattern_dense(H, H.shape[0])
                self._linear.factorize_dense(H)
            direction = self._linear.solve(-grad)
        except Exception as e:  # factorization failure → strategy failure
            # (reference catches and turns into nan direction, Newton.cpp:189-202)
            if self.logger:
                self.logger.debug("%s: linear solve failed: %s", self.name(), e)
            return None

        self._internal_info.append(self._linear.get_info())
        if not np.all(np.isfinite(direction)):
            return None
        # residual acceptance check (Newton.cpp:154-168, :207)
        residual = np.linalg.norm(H @ direction + grad)
        if not np.isfinite(residual) or residual > self.residual_tolerance * \
                max(np.linalg.norm(grad), 1.0):
            if self.logger:
                self.logger.debug("%s: linear residual %.3e rejected",
                                  self.name(), residual)
            return None
        self.info["internal_solver"] = self._internal_info[-5:]
        return np.asarray(direction)


class DenseNewton(Newton):
    name_str = "DenseNewton"
    force_dense = True

    def _make_linear_solver(self) -> LinearSolver:
        params = dict(self.linear_solver_params)
        params["solver"] = "Dense::LDLT"
        return LinearSolver.create(params, logger=self.logger, strict=False)


class ProjectedNewton(Newton):
    """PSD-projected Hessian (reference Newton.cpp:266-273)."""

    name_str = "ProjectedNewton"

    def compute_update_direction(self, problem, x, grad):
        problem.set_project_to_psd(True)
        try:
            return super().compute_update_direction(problem, x, grad)
        finally:
            problem.set_project_to_psd(False)


class RegularizedNewton(Newton):
    """H + w·I with escalation on failure (reference Newton.cpp:275-330).
    The Hessian at x is cached so escalation retries skip re-assembly."""

    name_str = "RegularizedNewton"

    def __init__(self, params=None, logger=None, linear_solver_params=None,
                 characteristic_length: float = 1.0):
        super().__init__(params, logger, linear_solver_params, characteristic_length)
        self.reg_weight_min = float(self.params.get("reg_weight_min", 1e-8))
        self.reg_weight_max = float(self.params.get("reg_weight_max", 1e8))
        self.reg_weight_inc = float(self.params.get("reg_weight_inc", 10.0))
        self.reg_weight = self.reg_weight_min
        self._cached_x = None
        self._cached_H = None

    def reset(self, ndof: int) -> None:
        super().reset(ndof)
        self.reg_weight = self.reg_weight_min
        self._cached_x = None
        self._cached_H = None

    def _assemble(self, problem, x):
        if self._cached_x is not None and np.array_equal(self._cached_x, x):
            return self._cached_H
        H = super()._assemble(problem, x)
        self._cached_x = np.asarray(x).copy()
        self._cached_H = H
        return H

    def _regularize(self, H):
        if self.reg_weight <= 0:
            return H
        n = H.shape[0]
        if sp.issparse(H):
            return H + self.reg_weight * sp.identity(n, format="csr")
        return H + self.reg_weight * np.eye(n)

    def handle_error(self) -> bool:
        if self.reg_weight < self.reg_weight_max:
            self.reg_weight = min(self.reg_weight * self.reg_weight_inc,
                                  self.reg_weight_max)
            return True
        return False

    def update_solution(self, x, grad) -> None:
        # relax regularization after successful steps
        self.reg_weight = max(self.reg_weight / self.reg_weight_inc,
                              self.reg_weight_min)


class RegularizedProjectedNewton(RegularizedNewton):
    """Regularization + PSD projection combined — the reference's
    ``RegularizedNewton(sparse, project_to_psd=true, ...)`` constructed for
    the "RegularizedProjectedNewton" spec type and for the expanded Newton
    chain when ``Newton/use_psd_projection_in_regularized`` is true
    (reference Solver.cpp:59-63, Newton.cpp:47-52)."""

    name_str = "RegularizedProjectedNewton"

    def compute_update_direction(self, problem, x, grad):
        problem.set_project_to_psd(True)
        try:
            return super().compute_update_direction(problem, x, grad)
        finally:
            problem.set_project_to_psd(False)


class DenseProjectedNewton(ProjectedNewton, DenseNewton):
    """Dense-path PSD-projected Newton (reference spec type
    "DenseProjectedNewton")."""

    name_str = "DenseProjectedNewton"


class DenseRegularizedNewton(RegularizedNewton, DenseNewton):
    name_str = "DenseRegularizedNewton"


class DenseRegularizedProjectedNewton(RegularizedProjectedNewton, DenseNewton):
    name_str = "DenseRegularizedProjectedNewton"
