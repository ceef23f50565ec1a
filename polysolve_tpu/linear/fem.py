"""FEM helpers: Dirichlet boundary-condition elimination + solve drivers
(the reference's L3 layer, src/polysolve/linear/FEMSolver.{hpp,cpp}).

``dirichlet_solve`` follows FEMSolver.cpp:97-267 exactly:

1. build the boundary mask N (1 at Dirichlet dofs), rhs
   ``g = f − (I−N)·A·(N·f)`` (FEMSolver.cpp:123) — the rhs vector ``f``
   carries the prescribed boundary values at the Dirichlet positions;
2. rebuild A with BC rows/cols replaced by identity (FEMSolver.cpp:136-161);
3. optionally drop all-zero columns via a gather submatrix
   (``remove_zero_cols``, FEMSolver.cpp:166-236);
4. analyze_pattern → factorize → solve (FEMSolver.cpp:248-250);
5. optional MatrixMarket dump (``save_path``, FEMSolver.cpp:254-257) and
   extremal-eigenvalue spectrum [λ₁, λ₂, λ_{n−1}, λ_n]
   (``compute_spectrum``, FEMSolver.cpp:19-54 — Spectra shift-invert there,
   Lanczos via scipy.sparse.linalg.eigsh here).

``prefactorize`` / ``dirichlet_solve_prefactorized`` split the elimination +
factorization from the per-rhs solve (FEMSolver.cpp:269-342), pinned by the
reference's pre_factor test.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from polysolve_tpu.linear.solver import Solver


def _eliminate_dirichlet(
    A: sp.spmatrix, f: np.ndarray, dirichlet_nodes: Sequence[int]
) -> Tuple[sp.csr_matrix, np.ndarray]:
    A = sp.csr_matrix(A)
    n = A.shape[0]
    f = np.asarray(f, dtype=np.float64)
    bc = np.zeros(n, dtype=bool)
    bc[np.asarray(list(dirichlet_nodes), dtype=np.int64)] = True

    # g = f − (I−N)·A·(N·f)   (FEMSolver.cpp:115-123)
    Nf = np.where(bc[:, None] if f.ndim == 2 else bc, f, 0.0)
    ANf = A @ Nf
    g = f - np.where(bc[:, None] if f.ndim == 2 else bc, 0.0, ANf)

    # rebuild A: Dirichlet rows/cols → identity (FEMSolver.cpp:136-161)
    keep = ~bc
    D = sp.diags(keep.astype(np.float64))
    A_elim = sp.csr_matrix(D @ A @ D)
    A_elim = A_elim + sp.diags(bc.astype(np.float64))
    A_elim.eliminate_zeros()
    return A_elim, g


def _remove_zero_cols(
    A: sp.csr_matrix, g: np.ndarray, skip_last_cols: int = 0
) -> Tuple[sp.csr_matrix, np.ndarray, np.ndarray]:
    """Drop columns (and matching rows — square system) with no nonzeros
    (FEMSolver.cpp:166-236; the `slice` gather is :56-94)."""
    n = A.shape[0]
    col_nnz = np.asarray(np.abs(A).sum(axis=0)).ravel()
    valid = col_nnz != 0
    if skip_last_cols:
        valid[n - skip_last_cols:] = True
    idx = np.flatnonzero(valid)
    As = A[idx][:, idx]
    gs = g[idx] if g.ndim == 1 else g[idx, :]
    return sp.csr_matrix(As), gs, idx


def dirichlet_solve(
    solver: Solver,
    A: sp.spmatrix,
    f: np.ndarray,
    dirichlet_nodes: Sequence[int],
    precond_num: int = 0,
    save_path: Optional[str] = None,
    compute_spectrum: bool = False,
    remove_zero_cols: bool = False,
    skip_last_cols: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Solve A u = f with Dirichlet values taken from f at ``dirichlet_nodes``.
    Returns (u, spectrum) where spectrum is [λ₁, λ₂, λ_{n−1}, λ_n] when
    requested, else an empty array (reference FEMSolver.hpp:35-40)."""
    A_elim, g = _eliminate_dirichlet(A, f, dirichlet_nodes)
    n = A_elim.shape[0]

    if remove_zero_cols:
        As, gs, idx = _remove_zero_cols(A_elim, g, skip_last_cols)
        solver.analyze_pattern(As, precond_num)
        solver.factorize(As)
        us = solver.solve(gs)
        u = np.zeros_like(g)
        u[idx] = us
    else:
        solver.analyze_pattern(A_elim, precond_num)
        solver.factorize(A_elim)
        u = solver.solve(g)

    if save_path:
        from scipy.io import mmwrite

        mmwrite(save_path, A_elim)

    spectrum = np.array([])
    if compute_spectrum:
        spectrum = _extremal_spectrum(A_elim)
    return u, spectrum


def _extremal_spectrum(A: sp.spmatrix, k: int = 2) -> np.ndarray:
    """[λ₁, λ₂, λ_{n−1}, λ_n] via Lanczos (reference uses Spectra shift-invert,
    FEMSolver.cpp:19-54)."""
    from scipy.sparse.linalg import eigsh

    n = A.shape[0]
    if n <= 16:
        vals = np.sort(np.linalg.eigvalsh(A.toarray()))
        return np.array([vals[0], vals[1], vals[-2], vals[-1]])
    small = eigsh(A, k=k, sigma=0, which="LM", return_eigenvectors=False)
    large = eigsh(A, k=k, which="LM", return_eigenvectors=False)
    small, large = np.sort(small), np.sort(large)
    return np.array([small[0], small[1], large[0], large[1]])


class Prefactorization:
    """Opaque handle returned by :func:`prefactorize`
    (reference FEMSolver.cpp:269-316 keeps this state inside the solver; an
    explicit handle is cleaner in Python)."""

    def __init__(self, solver: Solver, A_orig: sp.csr_matrix, bc: np.ndarray):
        self.solver = solver
        self.A_orig = A_orig
        self.bc = bc


def prefactorize(
    solver: Solver,
    A: sp.spmatrix,
    dirichlet_nodes: Sequence[int],
    precond_num: int = 0,
    save_path: Optional[str] = None,
) -> Prefactorization:
    """BC elimination + analyze + factorize only (reference FEMSolver.cpp:269-316)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    bc = np.zeros(n, dtype=bool)
    bc[np.asarray(list(dirichlet_nodes), dtype=np.int64)] = True
    keep = ~bc
    D = sp.diags(keep.astype(np.float64))
    A_elim = sp.csr_matrix(D @ A @ D) + sp.diags(bc.astype(np.float64))
    A_elim.eliminate_zeros()
    solver.analyze_pattern(A_elim, precond_num)
    solver.factorize(A_elim)
    if save_path:
        from scipy.io import mmwrite

        mmwrite(save_path, A_elim)
    return Prefactorization(solver, A, bc)


def dirichlet_solve_prefactorized(
    pre: Prefactorization, f: np.ndarray
) -> np.ndarray:
    """Per-rhs update + solve reusing the factorization
    (reference FEMSolver.cpp:318-342)."""
    bc = pre.bc
    f = np.asarray(f, dtype=np.float64)
    Nf = np.where(bc[:, None] if f.ndim == 2 else bc, f, 0.0)
    ANf = pre.A_orig @ Nf
    g = f - np.where(bc[:, None] if f.ndim == 2 else bc, 0.0, ANf)
    return pre.solver.solve(g)
