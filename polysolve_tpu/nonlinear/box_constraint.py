"""Box-constrained solving: BoxConstraintSolver + the L-BFGS-B and MMA
strategies (reference nonlinear/BoxConstraintSolver.{hpp,cpp} and
box_constraints/{LBFGSB,MMA}.cpp).

- bounds: global ``[lo, hi]`` pair or per-dof (n,2)/([lo...],[hi...]) arrays,
  plus ``max_change`` step clamping (BoxConstraintSolver.cpp:67-156);
- convergence measures the **projected-gradient norm**
  ``‖clamp(x − ∇f, lo, hi) − x‖`` (BoxConstraintSolver.cpp:96-110);
- ``LBFGSB``: true L-BFGS-B — generalized Cauchy point + subspace
  minimization over the free set with the compact limited-memory model
  (Byrd–Lu–Nocedal–Zhu; reference LBFGSB.cpp:33-88 via LBFGSpp);
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
    """True L-BFGS-B (Byrd–Lu–Nocedal–Zhu 1995): generalized Cauchy point
    along the projected steepest-descent path, then subspace minimization of
    the limited-memory quadratic model over the free variables — the
    algorithm the reference gets from LBFGSpp (reference LBFGSB.cpp:33-88:
    ``Cauchy::get_cauchy_point`` + ``SubspaceMin::subspace_minimize``).

    The limited-memory matrix uses the compact representation
    B = θI − W·M·Wᵀ with W = [Y | θS],
    M = [[−D, Lᵀ], [L, θSᵀS]]⁻¹ (D = diag(sᵢᵀyᵢ), L strictly lower).
    With no usable history the direction degenerates to the projected
    gradient — identical to the pre-round-3 shortcut."""

    name_str = "L-BFGS-B"

    def __init__(self, params=None, logger=None):
        super().__init__(params, logger)
        self.bounds_fn = None

    def set_bounds_fn(self, fn):
        self.bounds_fn = fn

    def _compact(self):
        """(θ, W, M) of the compact limited-memory representation."""
        S = np.stack(list(self.s), axis=1)        # (n, k)
        Y = np.stack(list(self.y), axis=1)
        s_l, y_l = self.s[-1], self.y[-1]
        theta = float(y_l @ y_l) / float(s_l @ y_l)
        W = np.concatenate([Y, theta * S], axis=1)          # (n, 2k)
        SY = S.T @ Y                                        # (k, k)
        D = np.diag(np.diag(SY))
        L = np.tril(SY, -1)
        k = S.shape[1]
        Minv = np.block([[-D, L.T], [L, theta * (S.T @ S)]])
        M = np.linalg.inv(Minv)                             # (2k, 2k)
        return theta, W, M

    def compute_update_direction(self, problem, x, grad):
        self._update_history(x, grad)
        lower, upper = self.bounds_fn(x)

        if not self.s:
            d = np.clip(x - grad, lower, upper) - x
            return d if d.any() else None

        try:
            theta, W, M = self._compact()
            xcp, c, free = _cauchy_point(x, grad, lower, upper, theta, W, M)
            xbar = _subspace_min(x, grad, lower, upper, theta, W, M,
                                 xcp, c, free)
        except np.linalg.LinAlgError:
            xbar = None
        if xbar is None or not np.all(np.isfinite(xbar)):
            # degenerate model → projected steepest descent
            d = np.clip(x - grad, lower, upper) - x
            return d if d.any() else None
        d = xbar - x
        if not d.any() or float(d @ grad) >= 0:
            # zero or uphill model step (near-singular subspace system) →
            # projected steepest descent safeguard
            d = np.clip(x - grad, lower, upper) - x
            if not d.any():
                return None
        return d

    def is_direction_descent(self) -> bool:
        return False  # bound activities can deflect the model direction


def _cauchy_point(x, g, lower, upper, theta, W, M):
    """Generalized Cauchy point along x(t) = P(x − t·g) (Byrd et al. 1995
    Algorithm CP). Returns (x_cp, c = Wᵀ(x_cp − x), free_mask)."""
    n = len(x)
    t = np.full(n, np.inf)
    d = -g.astype(np.float64).copy()
    neg = g < 0
    pos = g > 0
    t[neg] = (x[neg] - upper[neg]) / g[neg]
    t[pos] = (x[pos] - lower[pos]) / g[pos]
    d[t == 0] = 0.0

    xcp = x.astype(np.float64).copy()
    # variables with t == 0 start at their bound
    xcp[(t == 0) & pos] = lower[(t == 0) & pos]
    xcp[(t == 0) & neg] = upper[(t == 0) & neg]

    order = np.argsort(t)
    p = W.T @ d                       # (2k,)
    c = np.zeros(W.shape[1])
    fp = -float(d @ d)
    fpp = -theta * fp - float(p @ M @ p)
    fpp = max(fpp, 1e-300)  # f'' = dᵀBd > 0 for θ>0; guard fp rounding
    dt_min = -fp / fpp
    t_old = 0.0

    j = 0
    while j < n and t[order[j]] <= 0.0:
        j += 1
    while j < n and np.isfinite(t[order[j]]):
        b = order[j]
        t_b = t[b]
        dt = t_b - t_old
        if dt_min < dt:
            break
        # variable b hits its bound at t_b
        xcp[b] = upper[b] if g[b] < 0 else lower[b]
        zb = xcp[b] - x[b]
        c = c + dt * p
        gb = g[b]
        wb = W[b]
        Mc = M @ c
        Mp = M @ p
        Mw = M @ wb
        fp += dt * fpp + gb * gb + theta * gb * zb - gb * float(wb @ Mc)
        fpp += -theta * gb * gb - 2.0 * gb * float(wb @ Mp) \
            - gb * gb * float(wb @ Mw)
        fpp = max(fpp, 1e-300)
        p = p + gb * wb
        d[b] = 0.0
        dt_min = -fp / fpp
        t_old = t_b
        j += 1

    dt_min = max(dt_min, 0.0)
    t_final = t_old + dt_min
    move = (d != 0) & (t > t_old)
    xcp[move] = x[move] + t_final * d[move]
    np.clip(xcp, lower, upper, out=xcp)
    c = c + dt_min * p
    # free = variables strictly inside their bounds at the Cauchy point
    free = (xcp > lower) & (xcp < upper)
    return xcp, c, free


def _subspace_min(x, g, lower, upper, theta, W, M, xcp, c, free):
    """Direct primal subspace minimization over the free set (Byrd et al.
    1995 §5.1), followed by the α-truncation back onto the box."""
    if not np.any(free):
        return xcp
    # reduced gradient of the quadratic model at x_cp
    r = g + theta * (xcp - x) - W @ (M @ c)
    rf = r[free]
    Wf = W[free]                                  # (nf, 2k)
    v = M @ (Wf.T @ rf)
    N = np.eye(M.shape[0]) - (1.0 / theta) * (M @ (Wf.T @ Wf))
    v = np.linalg.solve(N, v)
    df = -(1.0 / theta) * rf - (1.0 / theta ** 2) * (Wf @ v)
    # largest α ∈ (0, 1] keeping the free variables in the box
    xf = xcp[free]
    lo, hi = lower[free], upper[free]
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha_hi = np.where(df > 0, (hi - xf) / df, np.inf)
        alpha_lo = np.where(df < 0, (lo - xf) / df, np.inf)
    alpha = min(1.0, float(np.min(np.minimum(alpha_hi, alpha_lo), initial=1.0)))
    alpha = max(alpha, 0.0)
    xbar = xcp.copy()
    xbar[free] = np.clip(xf + alpha * df, lo, hi)
    return xbar


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
