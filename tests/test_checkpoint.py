"""Checkpoint/resume + symbolic persistence (polysolve_tpu/checkpoint.py —
the SURVEY.md §5 subsystem the reference lacks)."""

import numpy as np
import scipy.sparse as sp

import polysolve_tpu.checkpoint as ckpt
from polysolve_tpu.linear.supernodal import SupernodalCholesky
from polysolve_tpu.nonlinear import Problem, Solver


def poisson2d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I))


def test_pattern_hash_values_independent():
    A = poisson2d(10)
    h1 = ckpt.pattern_hash(A)
    h2 = ckpt.pattern_hash(sp.csr_matrix(3.0 * A))
    assert h1 == h2
    B = A.copy().tolil()
    B[0, 5] = 1.0
    B[5, 0] = 1.0
    assert ckpt.pattern_hash(sp.csr_matrix(B)) != h1


def test_symbolic_cache_roundtrip(tmp_path):
    cache = ckpt.SymbolicCache(directory=str(tmp_path))
    A = poisson2d(8)
    h = ckpt.pattern_hash(A)
    assert cache.get("k", h) is None
    cache.put("k", h, {"x": np.arange(3)})
    got = cache.get("k", h)
    assert np.array_equal(got["x"], np.arange(3))
    # a fresh cache instance reloads from disk
    cache2 = ckpt.SymbolicCache(directory=str(tmp_path))
    got2 = cache2.get("k", h)
    assert np.array_equal(got2["x"], np.arange(3))


def test_supernodal_symbolic_shared_across_instances():
    """Two solver instances on the same pattern share one symbolic object
    (the cross-instance analog of the reference's pre_factor contract)."""
    A = sp.csr_matrix(poisson2d(16) + 0.1 * sp.identity(256))
    S1 = SupernodalCholesky(tile=8)
    S1.analyze(A)
    S2 = SupernodalCholesky(tile=8)
    S2.analyze(A)
    assert S1.sym is S2.sym


def test_supernodal_pattern_change_reanalyzes():
    A = sp.csr_matrix(poisson2d(12) + 0.1 * sp.identity(144))
    S = SupernodalCholesky(tile=8)
    S.factorize(A)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(144)
    x = S.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-10
    # densify the pattern — factorize must notice without an explicit analyze
    A2 = sp.csr_matrix(A + 0.05 * poisson2d(12) @ poisson2d(12))
    S.factorize(A2)
    x2 = S.solve(b)
    assert np.linalg.norm(A2 @ x2 - b) / np.linalg.norm(b) < 1e-10


def test_solver_state_roundtrip(tmp_path):
    path = str(tmp_path / "state")
    ckpt.save_solver_state(path, x=np.linspace(0, 1, 5), iteration=7)
    st = ckpt.load_solver_state(path)
    assert st is not None
    assert np.allclose(st["x"], np.linspace(0, 1, 5))
    assert int(st["iteration"]) == 7
    assert ckpt.load_solver_state(str(tmp_path / "missing")) is None


class Quadratic(Problem):
    def __init__(self, n=6):
        rng = np.random.default_rng(3)
        M = rng.standard_normal((n, n))
        self.A = M @ M.T + n * np.eye(n)
        self.b = rng.standard_normal(n)

    def value(self, x):
        return 0.5 * x @ self.A @ x - self.b @ x

    def gradient(self, x):
        return self.A @ x - self.b

    def hessian(self, x):
        return self.A


def test_checkpointed_minimize_resumes(tmp_path):
    path = str(tmp_path / "newton")
    prob = Quadratic()
    solver = Solver.create({"solver": "GradientDescent", "max_iterations": 3,
                            "allow_out_of_iterations": True})
    x0 = np.zeros(6)
    x1 = ckpt.checkpointed_minimize(solver, prob, x0, path, every=1)
    st = ckpt.load_solver_state(path)
    assert st is not None and np.allclose(st["x"], x1)
    # resume: a second run starts from the checkpoint, not x0
    solver2 = Solver.create({"solver": "L-BFGS", "max_iterations": 500})
    x2 = ckpt.checkpointed_minimize(solver2, prob, x0, path, every=50)
    xstar = np.linalg.solve(prob.A, prob.b)
    assert np.linalg.norm(x2 - xstar) < 1e-6
