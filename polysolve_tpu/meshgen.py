"""Unstructured-mesh generation + vectorized P1 FEM assembly (host/numpy).

The reference pins its behavior on *real* FEM matrices (A_2, gr_30_30,
crystm03, the A0/b0 saddle-point pair — reference
tests/test_linear_solver.cpp:25-50, :464-474, :858-869) loaded from the
external polyfem-data repo. This module generates matrices with the same
character on the fly — genuinely unstructured Delaunay meshes (no grid
stencil: the structured DIA/AMG fast paths cannot engage) and standard
P1 stiffness assembly:

- ``poisson_stiffness``    — scalar Laplace (A_2 / gr_30_30 role)
- ``elasticity_stiffness`` — 2-D/3-D linear elasticity, 2/3 dofs per node
  (crystm03 / MAS block_dim role, reference MASSolver.cu:198)
- ``stokes_saddle``        — Taylor–Hood-like KKT system (A0/b0 role)
- ``rigid_body_modes``     — the near-nullspace vectors Hypre's GM
  interpolation consumes (HypreSolver.cpp:191-272 → ``set_is_nullspace``)

Everything is vectorized numpy (no Python per-element loops) so 1M+-row
fixtures assemble in seconds for the benchmarks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp


# --------------------------------------------------------------------------- #
# Meshes                                                                      #
# --------------------------------------------------------------------------- #


def delaunay_mesh(nx: int, ny: int, nz: Optional[int] = None, seed: int = 0,
                  jitter: float = 0.35,
                  min_quality: float = 0.05) -> Tuple[np.ndarray, np.ndarray]:
    """Unstructured simplicial mesh: jittered lattice points + Delaunay,
    with a cell-quality floor. Raw jittered Delaunay keeps near-degenerate
    slivers (volume fine, aspect terrible) whose P1 stiffness runs ~1e5× the
    median diagonal — a coefficient-contrast regime no quality mesher
    (tetgen/tetwild, what polyfem actually feeds the reference) produces.
    ``min_quality`` drops cells with vol/(0.11785·rms_edge³) below the
    threshold (1.0 = regular simplex; 0.05 keeps ~97.5% of cells and caps
    the diagonal contrast at ~14×). Pass ``min_quality=0`` for the raw
    sliver mesh (the AMG robustness stress fixture).

    Returns (points (n, d), cells (m, d+1)).
    """
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    if nz is None:
        xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    else:
        xs, ys, zs = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij")
        pts = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(
            np.float64)
    pts += jitter * rng.uniform(-1.0, 1.0, size=pts.shape)
    tri = Delaunay(pts)
    cells = np.asarray(tri.simplices, dtype=np.int64)
    # drop degenerate (near-zero-volume) cells Delaunay can emit on the hull
    vol = np.abs(_volumes(pts, cells))
    keep = vol > 1e-9
    if min_quality > 0:
        d = pts.shape[1]
        P = pts[cells]                         # (m, d+1, d)
        npairs, e2 = 0, np.zeros(len(cells))
        for i in range(d + 1):
            for j in range(i + 1, d + 1):
                e2 += ((P[:, i] - P[:, j]) ** 2).sum(axis=1)
                npairs += 1
        rms = np.sqrt(e2 / npairs)
        # regular-simplex volume coefficients: area = (√3/4)a², vol =
        # (√2/12)a³
        coef = 0.43301 if d == 2 else 0.11785
        q = vol / (coef * np.maximum(rms, 1e-30) ** d)
        keep &= q > min_quality
    return pts, cells[keep]


def _volumes(pts: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Signed simplex volumes, vectorized."""
    d = pts.shape[1]
    E = pts[cells[:, 1:]] - pts[cells[:, :1]]      # (m, d, d)
    return np.linalg.det(E) / (1.0 if d == 1 else (2.0 if d == 2 else 6.0))


def _grads(pts: np.ndarray, cells: np.ndarray):
    """P1 shape-function gradients per cell.

    Returns (grads (m, d+1, d), vols (m,)) with vols > 0.
    """
    m, k = cells.shape
    d = pts.shape[1]
    E = pts[cells[:, 1:]] - pts[cells[:, :1]]      # (m, d, d) edge matrix
    Einv = np.linalg.inv(E)                        # (m, d, d)
    # gradient of barycentric λ_i (i>=1) are rows of Einv^T; λ_0 = -Σ λ_i
    g = np.transpose(Einv, (0, 2, 1))              # (m, d, d): g[:, i-1, :]
    grads = np.empty((m, k, d))
    grads[:, 1:, :] = g
    grads[:, 0, :] = -g.sum(axis=1)
    vols = np.abs(np.linalg.det(E)) / (2.0 if d == 2 else 6.0)
    return grads, vols


def _assemble(rows, cols, vals, n, chunk: int = 1 << 26) -> sp.csr_matrix:
    """COO→CSR assembly in chunks to bound peak memory at 10M+ entries."""
    rows = rows.ravel()
    cols = cols.ravel()
    vals = vals.ravel()
    if len(vals) <= chunk:
        A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    else:
        A = sp.csr_matrix((n, n))
        for s in range(0, len(vals), chunk):
            e = s + chunk
            A = A + sp.coo_matrix(
                (vals[s:e], (rows[s:e], cols[s:e])), shape=(n, n)).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()
    return A


# --------------------------------------------------------------------------- #
# Operators                                                                   #
# --------------------------------------------------------------------------- #


def poisson_stiffness(pts: np.ndarray, cells: np.ndarray,
                      shift: float = 0.0) -> sp.csr_matrix:
    """P1 stiffness K_ij = ∫ ∇φ_i·∇φ_j (+ shift·M_lumped): SPD after the
    shift (pure Neumann Laplace is singular; shift>0 regularizes like the
    reference's shifted test fixtures)."""
    n = pts.shape[0]
    grads, vols = _grads(pts, cells)
    # element matrices: vols[:,None,None] * grads @ grads^T  (m, k, k)
    Ke = np.einsum("m,mid,mjd->mij", vols, grads, grads, optimize=True)
    k = cells.shape[1]
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    A = _assemble(rows, cols, Ke, n)
    if shift:
        lumped = np.zeros(n)
        np.add.at(lumped, cells.ravel(),
                  np.repeat(vols / k, k))
        A = A + sp.diags(shift * lumped)
    return sp.csr_matrix(A)


def mass_matrix(pts: np.ndarray, cells: np.ndarray,
                block_size: int = 1) -> sp.csr_matrix:
    """P1 consistent mass matrix M_ij = ∫ φ_i φ_j (simplex rule
    V/((k)(k+1))·(1+δ_ij), the V/20·(1+δ) tet formula). With
    ``block_size`` d > 1, each scalar entry becomes a d×d identity block
    with node-major interleaved dofs — the structure class of the
    reference's crystm03 fixture (an FEM mass matrix with 3 dofs/node,
    tests/test_linear_solver.cpp:604-731). SPD, well-conditioned."""
    n = pts.shape[0]
    k = cells.shape[1]
    vols = np.abs(_volumes(pts, cells))  # Delaunay emits both orientations
    base = (np.ones((k, k)) + np.eye(k)) / (k * (k + 1))
    Me = vols[:, None, None] * base[None]
    rows = np.repeat(cells[:, :, None], k, axis=2)
    cols = np.repeat(cells[:, None, :], k, axis=1)
    M = sp.csr_matrix(_assemble(rows, cols, Me, n))
    if block_size > 1:
        M = sp.csr_matrix(sp.kron(M, sp.identity(block_size), format="csr"))
    return M


def elasticity_stiffness(pts: np.ndarray, cells: np.ndarray, E: float = 1.0,
                         nu: float = 0.3,
                         dirichlet_frac: float = 0.02) -> sp.csr_matrix:
    """P1 linear elasticity stiffness, d dofs per node interleaved
    (node-major: dof = d*node + component, matching the reference's BSR
    block_dim layout, MASSolver.cu:198 / AMGCL_Block AMGCL.hpp:48-98).

    ``dirichlet_frac`` pins that fraction of nodes (lowest x-coordinate) by
    the identity-row elimination the reference uses (FEMSolver.cpp:136-161),
    making the operator SPD."""
    n, d = pts.shape
    grads, vols = _grads(pts, cells)                 # (m, k, d), (m,)
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    # K_e[(i,a),(j,b)] = vol·(λ ∂_a φ_i ∂_b φ_j + μ ∂_b φ_i ∂_a φ_j
    #                         + μ δ_ab ∇φ_i·∇φ_j)
    t1 = np.einsum("m,mia,mjb->miajb", lam * vols, grads, grads,
                   optimize=True)
    t2 = np.einsum("m,mib,mja->miajb", mu * vols, grads, grads,
                   optimize=True)
    dot = np.einsum("m,mid,mjd->mij", mu * vols, grads, grads, optimize=True)
    Ke = t1 + t2 + np.einsum("mij,ab->miajb", dot, np.eye(d), optimize=True)
    k = cells.shape[1]
    dof = (d * cells[:, :, None] + np.arange(d)[None, None, :]).reshape(
        cells.shape[0], k * d)                       # (m, k·d)
    rows = np.repeat(dof[:, :, None], k * d, axis=2)
    cols = np.repeat(dof[:, None, :], k * d, axis=1)
    A = _assemble(rows, cols, Ke.reshape(-1, k * d, k * d), n * d)
    if dirichlet_frac > 0:
        cut = np.quantile(pts[:, 0], dirichlet_frac)
        pinned_nodes = np.flatnonzero(pts[:, 0] <= cut)
        pinned = (d * pinned_nodes[:, None] + np.arange(d)).ravel()
        A = _eliminate_identity(A, pinned)
    return sp.csr_matrix(A)


def _eliminate_identity(A: sp.csr_matrix, dofs: np.ndarray) -> sp.csr_matrix:
    """Replace rows/cols ``dofs`` by identity (the reference's symmetric
    Dirichlet elimination, FEMSolver.cpp:136-161)."""
    A = sp.csr_matrix(A, copy=True)
    n = A.shape[0]
    mask = np.ones(n, dtype=bool)
    mask[dofs] = False
    D = sp.diags(mask.astype(np.float64))
    A = D @ A @ D + sp.diags((~mask).astype(np.float64))
    return sp.csr_matrix(A)


def stokes_saddle(nx: int = 16, ny: int = 16, seed: int = 0,
                  eps: float = 1e-8) -> Tuple[sp.csr_matrix, int]:
    """Stokes-like KKT system [[A, B], [Bᵀ, −eps·I]] on an unstructured mesh:
    A = vector Laplacian (velocity), B = discrete gradient (pressure) — the
    A0/b0 saddle-point fixture's role (precond_num = n_velocity_dofs,
    reference test_linear_solver.cpp:464-474).

    Returns (K, precond_num)."""
    pts, cells = delaunay_mesh(nx, ny, seed=seed)
    return stokes_saddle_from_mesh(pts, cells, eps=eps)


def stokes_saddle_from_mesh(pts: np.ndarray, cells: np.ndarray,
                            eps: float = 1e-8,
                            shift: float = 0.0) -> Tuple[sp.csr_matrix, int]:
    """stokes_saddle on a caller-supplied mesh — lets fixtures pin the exact
    velocity-block size (the vendored A0/b0 pair uses a 4967-node mesh so
    precond_num = 9934, matching the reference's A0 exactly,
    test_linear_solver.cpp:474). ``shift`` adds a lumped velocity mass term
    (a reaction/time-step term): the diag-based Schur approximation the
    reference's scheme relies on (S = A22 − A21·A12 after unit-diagonal
    scaling, SaddlePointSolver.cpp:145) needs a diagonally dominant (1,1)
    block — a pure vector Laplacian at 10⁴ dofs stalls it (measured rel
    0.92 after 12 outer iterations)."""
    n = pts.shape[0]
    A1 = poisson_stiffness(pts, cells, shift=shift)
    d = pts.shape[1]
    A = sp.block_diag([_eliminate_identity(
        A1, np.flatnonzero(pts[:, 0] <= np.quantile(pts[:, 0], 0.05)))] * d)
    grads, vols = _grads(pts, cells)
    k = cells.shape[1]
    # B[(i,a), j] = ∫ ∂_a φ_i · ψ_j  with P1 pressure ψ (same nodes)
    Be = np.einsum("m,mia->mia", vols / k, grads)    # (m, k, d)
    rows_l = []
    cols_l = []
    vals_l = []
    for a in range(d):
        dof_i = (d * cells + a)                      # (m, k) velocity dof
        rows_l.append(np.repeat(dof_i[:, :, None], k, axis=2).ravel())
        cols_l.append(np.repeat(cells[:, None, :], k, axis=1).ravel())
        vals_l.append(np.repeat(Be[:, :, a][:, :, None], k, axis=2).ravel())
    B = sp.coo_matrix(
        (np.concatenate(vals_l), (np.concatenate(rows_l),
                                  np.concatenate(cols_l))),
        shape=(d * n, n)).tocsr()
    C = -eps * sp.identity(n)
    K = sp.bmat([[A, B], [B.T, C]], format="csr")
    return K, d * n


def rigid_body_modes(pts: np.ndarray) -> np.ndarray:
    """Near-nullspace (RBM) vectors for elasticity, node-interleaved dofs:
    d translations + rotations (1 in 2-D, 3 in 3-D) — what Hypre's GM-2
    interpolation consumes (HypreSolver.cpp:191-272)."""
    n, d = pts.shape
    c = pts - pts.mean(axis=0)
    modes = []
    for a in range(d):
        v = np.zeros((n, d))
        v[:, a] = 1.0
        modes.append(v.ravel())
    if d == 2:
        v = np.zeros((n, 2))
        v[:, 0] = -c[:, 1]
        v[:, 1] = c[:, 0]
        modes.append(v.ravel())
    else:
        for (a, b) in ((0, 1), (1, 2), (0, 2)):
            v = np.zeros((n, 3))
            v[:, a] = -c[:, b]
            v[:, b] = c[:, a]
            modes.append(v.ravel())
    M = np.stack(modes, axis=1)
    return M / np.linalg.norm(M, axis=0, keepdims=True)


def matrix_market_load(path: str) -> sp.csr_matrix:
    """MatrixMarket loader (handles symmetric storage — the reference needs a
    custom loader for crystm03's symmetric-stored file,
    test_linear_solver.cpp:25-50; scipy expands symmetry natively)."""
    from scipy.io import mmread

    return sp.csr_matrix(mmread(path))


def matrix_market_save(path: str, A: sp.spmatrix) -> None:
    """MatrixMarket dump (reference saveMarket, FEMSolver.cpp:254-257)."""
    from scipy.io import mmwrite

    mmwrite(path, sp.coo_matrix(A))
