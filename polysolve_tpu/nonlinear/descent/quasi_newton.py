"""Quasi-Newton strategies: dense BFGS and limited-memory L-BFGS
(reference descent_strategies/BFGS.cpp:33-71, LBFGS.cpp:29-57 via LBFGSpp)."""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np

from polysolve_tpu.nonlinear.descent.base import DescentStrategy


class BFGS(DescentStrategy):
    """Dense BFGS on the inverse Hessian (the reference keeps a dense Hessian
    approximation and solves with a dense LDLT each step, BFGS.cpp:33-71; the
    inverse-update form is algebraically identical and saves the solve)."""

    name_str = "BFGS"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.Hinv = None
        self.x_prev = None
        self.g_prev = None

    def reset(self, ndof: int) -> None:
        self.Hinv = np.eye(ndof)
        self.x_prev = None
        self.g_prev = None

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        if self.Hinv is None or self.Hinv.shape[0] != len(x):
            self.reset(len(x))
        if self.x_prev is not None:
            s = x - self.x_prev
            y = grad - self.g_prev
            sy = float(s @ y)
            if sy > 1e-14 * np.linalg.norm(s) * np.linalg.norm(y):
                rho = 1.0 / sy
                I = np.eye(len(x))
                V = I - rho * np.outer(s, y)
                self.Hinv = V @ self.Hinv @ V.T + rho * np.outer(s, s)
        self.x_prev = x.copy()
        self.g_prev = grad.copy()
        return -self.Hinv @ grad


class LBFGS(DescentStrategy):
    """L-BFGS two-loop recursion, history m=6 (reference LBFGS.cpp:29-57 uses
    LBFGSpp's BFGSMat with m=6; first iteration = −∇f)."""

    name_str = "L-BFGS"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.m = int(self.params.get("history_size", 6))
        self.s = deque(maxlen=self.m)
        self.y = deque(maxlen=self.m)
        self.x_prev = None
        self.g_prev = None

    def reset(self, ndof: int) -> None:
        self.s.clear()
        self.y.clear()
        self.x_prev = None
        self.g_prev = None

    def _update_history(self, x, grad) -> None:
        """Curvature-guarded (s, y) pair collection — shared with the
        box-constrained L-BFGS-B subclass."""
        if self.x_prev is not None:
            s = x - self.x_prev
            y = grad - self.g_prev
            sy = float(s @ y)
            if sy > 1e-14 * max(np.linalg.norm(s) * np.linalg.norm(y), 1e-300):
                self.s.append(s)
                self.y.append(y)
        self.x_prev = x.copy()
        self.g_prev = grad.copy()

    def compute_update_direction(self, problem, x, grad) -> Optional[np.ndarray]:
        self._update_history(x, grad)

        q = grad.copy()
        alphas = []
        for s, y in zip(reversed(self.s), reversed(self.y)):
            rho = 1.0 / (s @ y)
            a = rho * (s @ q)
            alphas.append((a, rho, s, y))
            q -= a * y
        if self.s:
            s_l, y_l = self.s[-1], self.y[-1]
            gamma = (s_l @ y_l) / max(y_l @ y_l, 1e-300)
            q *= gamma
        for a, rho, s, y in reversed(alphas):
            b = rho * (y @ q)
            q += (a - b) * s
        return -q
