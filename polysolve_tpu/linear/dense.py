"""Dense direct solvers — thin adapters over XLA's native factorizations.

Replaces the reference's ``EigenDenseSolver<S>`` wrappers (EigenSolver.hpp:90-121,
.tpp:120-146; instantiated for LLT, LDLT, PartialPivLU, FullPivLU, the
HouseholderQR family and CompleteOrthogonalDecomposition — Solver.cpp:458-489)
and the cuSolverDN dense-LU GPU backend (CuSolverDN.cu:114-180; its fp32
variant ``cuSolverDN_float`` maps to the ``dtype`` parameter here).

XLA already ships MXU-tiled Cholesky / LU / QR on TPU, so these adapters only
manage the factor cache and the facade lifecycle. ``factorize(sparse)``
densifies, like the reference (EigenSolver.tpp:128-131).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from polysolve_tpu.linear.solver import Solver, register_solver
from polysolve_tpu.types import default_dtype


@functools.partial(jax.jit, static_argnames=("method",))
def _dense_factor(method: str, A):
    if method == "llt":
        return (jax.scipy.linalg.cho_factor(A, lower=True)[0],)
    if method in ("lu", "fullpivlu", "ldlt"):
        # "ldlt" = symmetric *indefinite* solver in Eigen (Bunch–Kaufman);
        # XLA ships no symmetric-indefinite factorization, so pivoted LU
        # provides the same solve capability (indefinite OK, singular fails)
        lu, piv = jax.scipy.linalg.lu_factor(A)
        return (lu, piv)
    if method in ("qr", "colpivqr", "fullpivqr", "cod"):
        q, r = jnp.linalg.qr(A)
        return (q, r)
    raise ValueError(method)


@functools.partial(jax.jit, static_argnames=("method",))
def _dense_solve(method: str, factors, b):
    if method == "llt":
        return jax.scipy.linalg.cho_solve((factors[0], True), b)
    if method in ("lu", "fullpivlu", "ldlt"):
        return jax.scipy.linalg.lu_solve(factors, b)
    if method in ("qr", "colpivqr", "fullpivqr", "cod"):
        q, r = factors
        return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)
    raise ValueError(method)


class DenseSolver(Solver):
    method = "lu"
    dtype_override = None
    refine_steps = 0

    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        return {}

    def __init__(self):
        super().__init__()
        self.factors = None
        self._n = 0

    def is_dense(self) -> bool:
        return True

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        pass

    def factorize(self, A) -> None:
        if sp.issparse(A):
            A = A.toarray()
        self.factorize_dense(np.asarray(A))

    def factorize_dense(self, A: np.ndarray) -> None:
        dtype = self.dtype_override or default_dtype()
        self._A_host = np.asarray(A, dtype=np.float64)
        Ad = jnp.asarray(self._A_host, dtype=dtype)
        self._n = Ad.shape[0]
        self.factors = _dense_factor(self.method, Ad)
        if not bool(jnp.all(jnp.isfinite(self.factors[0]))):
            # reference throws on Eigen NumericalIssue (EigenSolver.tpp:44-52)
            raise RuntimeError(f"{self.name()}: numerical issue during factorization")

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        if self.factors is None:
            raise RuntimeError("factorize() must be called before solve()")
        dtype = self.dtype_override or default_dtype()
        b64 = np.asarray(b, dtype=np.float64)
        out = np.asarray(_dense_solve(self.method, self.factors,
                                      jnp.asarray(b64, dtype=dtype)),
                         dtype=np.float64)
        # iterative refinement when the factorization is lower-precision than
        # the data (the Pardiso phase-33 refinement analog, Pardiso.cpp:297-398)
        for _ in range(self.refine_steps):
            r = b64 - self._A_host @ out
            dx = np.asarray(_dense_solve(self.method, self.factors,
                                         jnp.asarray(r, dtype=dtype)),
                            dtype=np.float64)
            out = out + dx
        return out

    def get_info(self) -> Dict[str, Any]:
        return {"solver": self.name(), "n": self._n}


@register_solver("Dense::LLT", aliases=["Eigen::LLT"])
class DenseLLT(DenseSolver):
    method = "llt"


@register_solver("Dense::LDLT", aliases=["Eigen::LDLT"])
class DenseLDLT(DenseSolver):
    method = "ldlt"


@register_solver("Dense::PartialPivLU", aliases=["Eigen::PartialPivLU", "cuSolverDN"])
class DensePartialPivLU(DenseSolver):
    method = "lu"


@register_solver("Dense::FullPivLU", aliases=["Eigen::FullPivLU"])
class DenseFullPivLU(DenseSolver):
    method = "fullpivlu"


@register_solver("Dense::HouseholderQR", aliases=["Eigen::HouseholderQR"])
class DenseHouseholderQR(DenseSolver):
    method = "qr"


@register_solver("Dense::ColPivHouseholderQR",
                 aliases=["Eigen::ColPivHouseholderQR"])
class DenseColPivQR(DenseSolver):
    method = "colpivqr"


@register_solver("Dense::FullPivHouseholderQR", aliases=["Eigen::FullPivHouseholderQR"])
class DenseFullPivQR(DenseSolver):
    method = "fullpivqr"


@register_solver("Dense::CompleteOrthogonalDecomposition",
                 aliases=["Eigen::CompleteOrthogonalDecomposition"])
class DenseCOD(DenseSolver):
    method = "cod"


@register_solver("Dense::PartialPivLU_float", aliases=["cuSolverDN_float"])
class DensePartialPivLUFloat(DenseSolver):
    """fp32 dense LU — the reference's ``cuSolverDN_float`` (CuSolverDN.cu,
    residual target 1e-6, test_linear_solver.cpp:837)."""

    method = "lu"
    dtype_override = jnp.float32
    refine_steps = 2
