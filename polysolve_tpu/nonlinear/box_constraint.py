"""Box-constrained solving: BoxConstraintSolver + the L-BFGS-B and MMA
strategies (reference nonlinear/BoxConstraintSolver.{hpp,cpp} and
box_constraints/{LBFGSB,MMA}.cpp).

- bounds: global ``[lo, hi]`` pair or per-dof (n,2)/([lo...],[hi...]) arrays,
  plus ``max_change`` step clamping (BoxConstraintSolver.cpp:67-156);
- convergence measures the **projected-gradient norm**
  ``‖clamp(x − ∇f, lo, hi) − x‖`` (BoxConstraintSolver.cpp:96-110);
- ``LBFGSB``: projected L-BFGS — two-loop direction, step projected onto the
  box (the Cauchy-point/subspace machinery of LBFGSpp's LBFGSB reduces to
  this projected form for the box-only case; reference LBFGSB.cpp:33-88);
- ``MMA``: Svanberg's Method of Moving Asymptotes with inequality-constraint
  support, dual interior-point subproblem solve (reference MMA.cpp:20-58,
  MMAAux.hpp). MMA forces line search "None" (BoxConstraintSolver.cpp:48-49).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from polysolve_tpu.nonlinear import descent as descent_mod
from polysolve_tpu.nonlinear.descent.base import DescentStrategy
from polysolve_tpu.nonlinear.descent.quasi_newton import LBFGS
from polysolve_tpu.nonlinear.line_search import create_line_search
from polysolve_tpu.nonlinear.solver import Solver, build_nonlinear_spec_rules
from polysolve_tpu import spec as spec_mod
from polysolve_tpu.utils import default_logger


def _parse_bounds(bounds, ndof: int):
    """Scalar pair or per-dof matrix (BoxConstraintSolver.cpp:116-156)."""
    b = np.asarray(bounds, dtype=np.float64)
    if b.size == 0:
        return np.full(ndof, -np.inf), np.full(ndof, np.inf)
    if b.shape == (2,):
        return np.full(ndof, b[0]), np.full(ndof, b[1])
    if b.ndim == 2 and b.shape[0] == 2 and b.shape[1] == ndof:
        return b[0].copy(), b[1].copy()
    if b.ndim == 2 and b.shape == (ndof, 2):
        return b[:, 0].copy(), b[:, 1].copy()
    raise ValueError(f"cannot interpret bounds of shape {b.shape} for {ndof} dofs")


class LBFGSB(LBFGS):
    """Projected L-BFGS for box constraints (reference LBFGSB.cpp:33-88)."""

    name_str = "L-BFGS-B"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.bounds_fn = None

    def set_bounds_fn(self, fn):
        self.bounds_fn = fn

    def compute_update_direction(self, problem, x, grad):
        d = super().compute_update_direction(problem, x, grad)
        if d is None:
            return None
        lower, upper = self.bounds_fn(x)
        # project the trial point onto the box; the direction to the
        # projection stays feasible for all step sizes in (0, 1]
        target = np.clip(x + d, lower, upper)
        d = target - x
        if not d.any():
            # wholly blocked → steepest projected descent
            d = np.clip(x - grad, lower, upper) - x
        return d

    def is_direction_descent(self) -> bool:
        return False  # projection can deflect the quasi-Newton direction


class MMA(DescentStrategy):
    """Method of Moving Asymptotes (Svanberg 1987/2002). Produces the full
    step to the subproblem optimum; the driver uses line search "None" so the
    step is taken whole (reference BoxConstraintSolver.cpp:48-49)."""

    name_str = "MMA"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.bounds_fn = None
        self.constraints: List = []
        self.x_hist: List[np.ndarray] = []
        self.low = None
        self.upp = None
        self.asyinit = float(self.params.get("asyinit", 0.5))
        self.asyincr = float(self.params.get("asyincr", 1.2))
        self.asydecr = float(self.params.get("asydecr", 0.7))

    def set_bounds_fn(self, fn):
        self.bounds_fn = fn

    def reset(self, ndof: int) -> None:
        self.x_hist = []
        self.low = None
        self.upp = None

    def is_direction_descent(self) -> bool:
        return False

    def compute_update_direction(self, problem, x, grad):
        lower, upper = self.bounds_fn(x)
        lo = np.where(np.isfinite(lower), lower, x - 10.0)
        hi = np.where(np.isfinite(upper), upper, x + 10.0)
        span = np.maximum(hi - lo, 1e-8)

        # asymptote update (Svanberg's rules)
        if len(self.x_hist) < 2:
            low = x - self.asyinit * span
            upp = x + self.asyinit * span
        else:
            x1, x2 = self.x_hist[-1], self.x_hist[-2]
            zzz = (x - x1) * (x1 - x2)
            factor = np.where(zzz > 0, self.asyincr,
                              np.where(zzz < 0, self.asydecr, 1.0))
            low = x - factor * (x1 - self.low)
            upp = x + factor * (self.upp - x1)
            low = np.clip(low, x - 10 * span, x - 0.01 * span)
            upp = np.clip(upp, x + 0.01 * span, x + 10 * span)
        self.low, self.upp = low, upp
        self.x_hist.append(x.copy())

        m = len(self.constraints)
        fval = np.array([c.value(x) for c in self.constraints]) if m else np.zeros(0)
        dfdx = (np.stack([np.asarray(c.gradient(x)) for c in self.constraints])
                if m else np.zeros((0, len(x))))

        xnew = _mma_subsolve(x, grad, fval, dfdx, low, upp, lo, hi)
        if xnew is None or not np.all(np.isfinite(xnew)):
            return None
        return xnew - x


def _mma_subsolve(x, df0dx, fval, dfdx, low, upp, alfa_lo, beta_hi,
                  raa0: float = 1e-5):
    """Solve the MMA subproblem (Svanberg 2002 §5) with a dual interior-point
    iteration. Returns the subproblem minimizer xmma."""
    n = len(x)
    m = len(fval)
    move_lo = np.maximum(alfa_lo, low + 0.1 * (x - low))
    move_hi = np.minimum(beta_hi, upp - 0.1 * (upp - x))
    ux1 = upp - x
    xl1 = x - low

    def pq(dfdx_row):
        dfp = np.maximum(dfdx_row, 0.0)
        dfm = np.maximum(-dfdx_row, 0.0)
        p = ux1**2 * (1.001 * dfp + 0.001 * dfm + raa0 / np.maximum(ux1 + xl1, 1e-12))
        q = xl1**2 * (0.001 * dfp + 1.001 * dfm + raa0 / np.maximum(ux1 + xl1, 1e-12))
        return p, q

    p0, q0 = pq(df0dx)
    if m:
        P = np.zeros((m, n))
        Q = np.zeros((m, n))
        for i in range(m):
            P[i], Q[i] = pq(dfdx[i])
        b = (P / ux1 + Q / xl1).sum(axis=1) - fval
    else:
        P = np.zeros((0, n))
        Q = np.zeros((0, n))
        b = np.zeros(0)

    def x_of_lam(lam):
        pl = p0 + (lam @ P if m else 0.0)
        ql = q0 + (lam @ Q if m else 0.0)
        sp = np.sqrt(np.maximum(pl, 1e-300))
        sq = np.sqrt(np.maximum(ql, 1e-300))
        xs = (sp * low + sq * upp) / np.maximum(sp + sq, 1e-300)
        return np.clip(xs, move_lo, move_hi)

    if m == 0:
        return x_of_lam(np.zeros(0))

    # maximize the (smooth, concave) Svanberg dual over λ ≥ 0. Host-side
    # bounded quasi-Newton — MMA setup is host logic in the reference too
    # (vendored serial implementation, MMAAux.hpp).
    from scipy.optimize import minimize as _sp_minimize

    def neg_dual_and_grad(lam):
        xs = x_of_lam(lam)
        val = float(
            np.sum((p0 + lam @ P) / np.maximum(upp - xs, 1e-12))
            + np.sum((q0 + lam @ Q) / np.maximum(xs - low, 1e-12))
            - lam @ b
        )
        g = (P / np.maximum(upp - xs, 1e-12)).sum(axis=1) + \
            (Q / np.maximum(xs - low, 1e-12)).sum(axis=1) - b
        return -val, -g

    res = _sp_minimize(neg_dual_and_grad, np.ones(m), jac=True,
                       method="L-BFGS-B", bounds=[(0.0, None)] * m,
                       options={"maxiter": 200, "ftol": 1e-16, "gtol": 1e-12})
    return x_of_lam(np.maximum(res.x, 0.0))


class BoxConstraintSolver(Solver):
    """Nonlinear solver with box constraints
    (reference BoxConstraintSolver.cpp:16-163)."""

    @classmethod
    def create(cls, solver_params=None, linear_solver_params=None,
               characteristic_length: float = 1.0, logger=None,
               strict: bool = True, constraints=()) -> "BoxConstraintSolver":
        logger = logger or default_logger
        params = spec_mod.validate_and_inject(
            solver_params or {}, build_nonlinear_spec_rules(), strict=strict,
            logger=logger)
        name = params.get("solver", "L-BFGS-B")
        if isinstance(name, list):
            name = name[0]
        if name in ("L-BFGS-B", "LBFGSB", "L-BFGS", "LBFGS"):
            strategy = LBFGSB(params.get("L-BFGS-B", params.get("L-BFGS", {})),
                              logger)
        elif name == "MMA":
            strategy = MMA(params.get("MMA", {}), logger)
            strategy.constraints = list(constraints)
            # MMA must use no line search (BoxConstraintSolver.cpp:48-49)
            ls = params.setdefault("line_search", {})
            if ls.get("method", "None") != "None":
                logger.warning("MMA requires line_search None; overriding")
            ls["method"] = "None"
        else:
            raise ValueError(f"Unrecognized box-constrained solver: {name}")
        line_search = create_line_search(params.get("line_search", {}), logger)
        solver = cls([strategy], line_search, params,
                     characteristic_length=characteristic_length, logger=logger)
        box = params.get("box_constraints", {})
        solver.bounds_raw = box.get("bounds", [])
        solver.max_change = box.get("max_change", -1.0)
        return solver

    def __init__(self, strategies, line_search, params,
                 characteristic_length=1.0, logger=None):
        super().__init__(strategies, line_search, params,
                         characteristic_length=characteristic_length,
                         logger=logger)
        self.bounds_raw = params.get("box_constraints", {}).get("bounds", [])
        self.max_change = params.get("box_constraints", {}).get("max_change", -1.0)
        self.lower = None
        self.upper = None

    def set_bounds(self, bounds) -> None:
        self.bounds_raw = bounds

    def minimize(self, problem, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        self.lower, self.upper = _parse_bounds(self.bounds_raw, len(x))
        mc = np.asarray(self.max_change, dtype=np.float64)
        if mc.size == 1 and float(mc) > 0:
            self._max_change_vec = np.full(len(x), float(mc))
        elif mc.size == len(x):
            self._max_change_vec = mc.astype(np.float64)
        else:
            self._max_change_vec = None
        for s in self.strategies:
            if hasattr(s, "set_bounds_fn"):
                s.set_bounds_fn(self._effective_bounds)
        x = np.clip(x, self.lower, self.upper)
        return super().minimize(problem, x)

    def _effective_bounds(self, x):
        """Box ∩ [x ± max_change] (the reference's max_change clamp,
        BoxConstraintSolver.cpp:67-94)."""
        lo, hi = self.lower, self.upper
        if self._max_change_vec is not None:
            lo = np.maximum(lo, x - self._max_change_vec)
            hi = np.minimum(hi, x + self._max_change_vec)
        return lo, hi

    def _grad_norm_for_convergence(self, problem, x, grad) -> float:
        """Projected-gradient norm ‖clamp(x−∇f)−x‖
        (BoxConstraintSolver.cpp:96-110)."""
        return float(np.linalg.norm(
            np.clip(x - grad, self.lower, self.upper) - x))
