"""Test harness: force an 8-device CPU mesh (the TPU-pod stand-in — the
distributed tests assert 1-device vs N-device solve parity, see SURVEY.md §4)
and enable fp64 for parity with the double-only reference."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def poisson2d(m: int) -> sp.csr_matrix:
    """2-D Poisson SPD stiffness matrix (the A_2-style fixture — the
    reference loads a small SPD FEM stiffness from polyfem-data;
    test_linear_solver.cpp:25-50)."""
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I))


def poisson3d(m: int) -> sp.csr_matrix:
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I) + sp.kron(sp.kron(T, I), I)
    )


def elasticity_like(m: int, b: int = 2, seed: int = 3) -> sp.csr_matrix:
    """Block-structured SPD matrix imitating a 2/3-dof-per-node FEM stiffness
    (stand-in for gr_30_30 / crystm03 in the block-solver tests,
    test_linear_solver.cpp:489-731)."""
    rng = np.random.default_rng(seed)
    P = poisson2d(m).tocsr()
    P.sort_indices()
    n = P.shape[0]
    # expand each scalar entry to a symmetric b×b block
    blocks = np.empty((P.nnz, b, b))
    for i, v in enumerate(P.data):
        M = rng.standard_normal((b, b)) * 0.1
        blocks[i] = v * (np.eye(b) + 0.5 * (M + M.T))
    A = sp.bsr_matrix((blocks, P.indices, P.indptr), shape=(n * b, n * b))
    A = sp.csr_matrix(A)
    A = 0.5 * (A + A.T) + 4.0 * b * sp.identity(n * b)
    return sp.csr_matrix(A)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def A_small():
    return poisson2d(12)


@pytest.fixture
def A_medium():
    return poisson2d(24)
