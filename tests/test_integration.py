"""Cross-stack integration tests: the nonlinear driver running the full
linear stack (Newton → AMG-PCG) on FEM-style sparse problems — the composed
path polyfem exercises in production (reference §3.3 call stack)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from polysolve_tpu.nonlinear import Solver
from polysolve_tpu.nonlinear.problem import Problem
from conftest import poisson2d


class QuadraticFormProblem(Problem):
    """E(x) = ½ xᵀAx − bᵀx with a *sparse* Hessian (the FEM shape: Newton's
    linear solve is exactly A x = b)."""

    def __init__(self, A, b):
        super().__init__()
        self.A = sp.csr_matrix(A)
        self.b = np.asarray(b)

    def value(self, x):
        x = np.asarray(x)
        return float(0.5 * x @ (self.A @ x) - self.b @ x)

    def gradient(self, x):
        return self.A @ np.asarray(x) - self.b

    def hessian(self, x):
        return self.A


def test_newton_amg_sparse_hessian():
    A = poisson2d(24)  # n = 576
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    s = Solver.create(
        {"solver": "Newton", "grad_norm": 1e-10, "relative_gradient": 0.0,
         "max_iterations": 30, "allow_out_of_iterations": True},
        linear_solver_params={"solver": "AMG",
                              "AMG": {"tolerance": 1e-12, "max_iter": 500,
                                      "coarse_enough": 50}},
    )
    prob = QuadraticFormProblem(A, b)
    x = s.minimize(prob, np.zeros(A.shape[0]))
    # the Newton minimizer of the quadratic form solves A x = b
    assert np.linalg.norm(A @ x - b) < 1e-8
    info = s.get_info()
    assert "internal_solver" in info  # nested linear get_info (Newton.cpp:209-211)
    assert info["iterations"] <= 3  # quadratic: one Newton step + checks


def test_newton_sparse_cholesky_inner():
    A = poisson2d(16)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    s = Solver.create(
        {"solver": "Newton", "grad_norm": 1e-10, "relative_gradient": 0.0,
         "allow_out_of_iterations": True},
        linear_solver_params={"solver": "SparseCholesky"},
    )
    x = s.minimize(QuadraticFormProblem(A, b), np.zeros(A.shape[0]))
    assert np.linalg.norm(A @ x - b) < 1e-8


class NonConvexSparse(Problem):
    """Adds a nonconvex perturbation so the fallback chain engages."""

    def __init__(self, A, b):
        super().__init__()
        self.A = sp.csr_matrix(A)
        self.b = np.asarray(b)

    def value(self, x):
        x = np.asarray(x)
        return float(0.5 * x @ (self.A @ x) - self.b @ x
                     - 0.5 * np.sum(np.cos(x)))

    def gradient(self, x):
        x = np.asarray(x)
        return self.A @ x - self.b + 0.5 * np.sin(x)

    def hessian(self, x):
        x = np.asarray(x)
        return self.A + sp.diags(0.5 * np.cos(x))


def test_newton_chain_nonconvex_sparse():
    A = poisson2d(12)
    rng = np.random.default_rng(2)
    b = 0.1 * rng.standard_normal(A.shape[0])
    s = Solver.create(
        {"solver": "Newton", "grad_norm": 1e-9, "relative_gradient": 0.0,
         "max_iterations": 200, "allow_out_of_iterations": True},
        linear_solver_params={"solver": "SparseCholesky"},
    )
    prob = NonConvexSparse(A, b)
    x = s.minimize(prob, rng.standard_normal(A.shape[0]))
    assert np.linalg.norm(prob.gradient(x)) < 1e-8
