"""Supernodal sparse Cholesky (linear/supernodal.py) — the general-pattern
direct path (reference parity: CHOLMOD/Pardiso SPD backends,
test_linear_solver.cpp `all` + `pre_factor`)."""

import numpy as np
import pytest
import scipy.sparse as sp

from polysolve_tpu import native
from polysolve_tpu.linear import Solver
from polysolve_tpu.linear.supernodal import (
    SupernodalCholesky, analyze, etree, md_ordering, postorder,
)


def poisson2d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I))


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )


def random_spd(n, density, seed):
    rng = np.random.default_rng(seed)
    M = sp.random(n, n, density=density, random_state=rng, format="csr")
    A = M + M.T
    A = sp.csr_matrix(A + sp.diags(np.abs(A).sum(axis=1).A1 + 1.0))
    return A


# --------------------------------------------------------------------------- #
# symbolic pieces                                                             #
# --------------------------------------------------------------------------- #


def test_md_order_reduces_fill():
    A = poisson2d(24)
    perm = native.md_order(A)
    assert perm is not None
    assert sorted(perm) == list(range(A.shape[0]))


def test_kway_partition_quality_and_balance():
    """Native multilevel K-way partition: valid part ids, bounded imbalance,
    edge cut clearly better than contiguous chunking (the KaMinPar role,
    reference GraphPartition.cpp:176-289)."""
    A = poisson2d(48)
    off = sp.csr_matrix(A - sp.diags(A.diagonal()))
    off.eliminate_zeros()
    n = A.shape[0]
    k = 32
    part = native.kway_partition(off, k)
    if part is None:
        pytest.skip("native library unavailable")
    assert part.min() >= 0 and part.max() < k
    sizes = np.bincount(part, minlength=k)
    assert sizes.max() <= 2 * n // k  # bounded imbalance

    def cut(p):
        C = sp.coo_matrix(off)
        return int(np.sum((p[C.row] != p[C.col]) & (C.row < C.col)))

    contiguous = np.arange(n) * k // n
    assert cut(part) < cut(contiguous)


def test_etree_postorder_is_permutation():
    A = poisson2d(10)
    perm = md_ordering(A)
    Ap = sp.csr_matrix(A[perm][:, perm])
    par = etree(sp.csc_matrix(sp.tril(Ap)))
    post = postorder(par)
    assert sorted(post) == list(range(A.shape[0]))
    # every child precedes its parent in a postorder
    rank = np.empty(len(post), dtype=int)
    rank[post] = np.arange(len(post))
    for v, p in enumerate(par):
        if p >= 0:
            assert rank[v] < rank[p]


def test_symbolic_pattern_superset_of_exact():
    """The block-fill analysis must cover every block of the exact factor."""
    A = random_spd(80, 0.08, seed=3)
    s = analyze(A, m=4)
    Ap = A[s.perm][:, s.perm].toarray()
    Ap_pad = np.eye(s.n_pad)
    Ap_pad[: s.n, : s.n] = Ap
    Lref = np.linalg.cholesky(Ap_pad)
    m = s.m
    sym = {(j, j) for j in range(s.nb)}
    for j in range(s.nb):
        for a in range(s.Wmax):
            if s.col_ids[j, a] < s.n_blocks:
                sym.add((int(s.col_rows[j, a]), j))
    for i in range(s.nb):
        for j in range(i + 1):
            blk = Lref[i * m:(i + 1) * m, j * m:(j + 1) * m]
            if np.abs(blk).max() > 1e-12:
                assert (i, j) in sym


# --------------------------------------------------------------------------- #
# numeric                                                                     #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("system,tile", [
    ("2d", 16), ("3d", 16), ("rand", 8),
])
def test_supernodal_solves(system, tile):
    if system == "2d":
        A = poisson2d(20) + 0.1 * sp.identity(400)
    elif system == "3d":
        A = poisson3d(10) + 0.1 * sp.identity(1000)
    else:
        A = random_spd(300, 0.03, seed=1)
    A = sp.csr_matrix(A)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    S = SupernodalCholesky(tile=tile)
    S.factorize(A)
    x = S.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-10


def test_supernodal_refactorize_same_pattern():
    """Symbolic/numeric split (reference pre_factor,
    test_linear_solver.cpp:241-307)."""
    A = poisson2d(16) + 0.1 * sp.identity(256)
    A = sp.csr_matrix(A)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(256)
    S = SupernodalCholesky(tile=8)
    S.analyze(A)
    sym = S.sym
    for scale in (1.0, 3.0, 0.25):
        A2 = sp.csr_matrix(scale * A)
        S.factorize(A2)
        assert S.sym is sym  # symbolic reused
        x = S.solve(b)
        assert np.linalg.norm(A2 @ x - b) / np.linalg.norm(b) < 1e-10


def test_supernodal_tail_solve_bands_parity():
    """Round-5 solve schedule (dense top-of-tree fold + width-trimmed band
    scans, _build_tail_solve_plan) matches the budget-schedule solve when
    the plan actually contains BOTH front bands and a dense tail (the
    default 8192-dof cap folds small test problems entirely into the tail,
    so this pins the mixed path with a small cap)."""
    from polysolve_tpu.linear.supernodal import _build_tail_solve_plan

    A = sp.csr_matrix(poisson3d(12) + 0.1 * sp.identity(12 ** 3))
    n = A.shape[0]
    b = np.random.default_rng(3).standard_normal(n)
    S = SupernodalCholesky(tile=32)
    S.factorize(A)
    S.solve_schedule = "budget"
    x0 = S.solve(b)
    plan = _build_tail_solve_plan(S.sym, tail_max_dofs=768, max_bands=3)
    assert plan is not None
    assert plan["Td"] > 0 and plan["steps_front"] > 0 and plan["bands"]
    S._solve_plan = plan
    S._solve_plan_phash = S._phash
    S.solve_schedule = "tail"
    x1 = S.solve(b)
    assert np.linalg.norm(A @ x1 - b) / np.linalg.norm(b) < 1e-10
    np.testing.assert_allclose(x1, x0, rtol=1e-9, atol=1e-9)


def test_supernodal_multirhs():
    A = sp.csr_matrix(poisson2d(12) + 0.1 * sp.identity(144))
    rng = np.random.default_rng(2)
    B = rng.standard_normal((144, 5))
    S = SupernodalCholesky(tile=8)
    S.factorize(A)
    X = S.solve(B)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-10


def test_supernodal_not_spd_raises():
    A = sp.csr_matrix(poisson2d(8) - 5.0 * sp.identity(64))  # indefinite
    S = SupernodalCholesky(tile=8)
    with pytest.raises(RuntimeError, match="SPD|numerical"):
        S.factorize(A)


# --------------------------------------------------------------------------- #
# facade integration                                                          #
# --------------------------------------------------------------------------- #


def test_facade_picks_supernodal_for_wide_band():
    """A 3D system whose RCM band is wide must take the supernodal path, not
    the dense fallback (the old behavior)."""
    A = sp.csr_matrix(poisson3d(16) + 0.1 * sp.identity(4096))
    solver = Solver.create("SparseCholesky")
    solver.analyze_pattern(A)
    assert solver.mode == "supernodal"
    solver.factorize(A)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(4096)
    x = solver.solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)
    info = solver.get_info()
    assert info["mode"] == "supernodal"
    assert info["n_blocks"] > 0


def test_facade_band_path_still_used_for_narrow_band():
    A = sp.csr_matrix(poisson2d(40) + 0.1 * sp.identity(1600))
    solver = Solver.create("SparseCholesky")
    solver.analyze_pattern(A)
    assert solver.mode == "band"
    solver.factorize(A)
    b = np.ones(1600)
    x = solver.solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)


# --------------------------------------------------------------------------- #
# blocked sparse LU (general / unsymmetric)                                    #
# --------------------------------------------------------------------------- #


def convdiff2d(m, c=5.0):
    """Unsymmetric convection-diffusion (upwind), diagonally dominant."""
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    A = sp.kron(I, T) + sp.kron(T, I)
    C = sp.diags([-c, c], [-1, 0], shape=(m, m))
    return sp.csr_matrix(A + sp.kron(I, C) * (1.0 / m) + 0.1 * sp.identity(m * m))


def test_supernodal_lu_unsymmetric():
    from polysolve_tpu.linear.supernodal import SupernodalLU

    A = convdiff2d(20)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])
    S = SupernodalLU(tile=8)
    S.factorize(A)
    x = S.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-10
    # refactorize, same pattern
    S.factorize(sp.csr_matrix(1.7 * A))
    x2 = S.solve(b)
    assert np.linalg.norm(1.7 * A @ x2 - b) / np.linalg.norm(b) < 1e-10


def test_sparse_lu_facade_supernodal():
    A = convdiff2d(20)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    sv = Solver.create("Eigen::SparseLU")
    sv.analyze_pattern(A)
    assert sv.mode == "supernodal"
    sv.factorize(A)
    x = sv.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-10
    assert sv.get_info()["mode"] == "supernodal"


def test_sparse_lu_zero_diagonal_block_pivoting():
    """A zero diagonal entry inside a block is handled by within-block
    partial pivoting (no dense fallback needed)."""
    A = convdiff2d(16).tolil()
    A[5, 5] = 0.0
    A = sp.csr_matrix(A)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.shape[0])
    sv = Solver.create("SparseLU")
    sv.analyze_pattern(A)
    sv.factorize(A)
    x = sv.solve(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-8


def test_sparse_lu_dense_for_tiny():
    A = sp.csr_matrix(np.array([[2.0, 1.0], [3.0, 4.0]]))
    sv = Solver.create("SparseLU")
    sv.analyze_pattern(A)
    assert sv.mode == "dense"
    sv.factorize(A)
    x = sv.solve(np.array([1.0, 2.0]))
    assert np.allclose(A @ x, [1.0, 2.0])


def test_facade_mode_override():
    A = sp.csr_matrix(poisson2d(20) + 0.1 * sp.identity(400))
    solver = Solver.create({"solver": "SparseCholesky",
                            "SparseCholesky": {"mode": "supernodal", "tile": 8}})
    solver.analyze_pattern(A)
    assert solver.mode == "supernodal"
    solver.factorize(A)
    b = np.ones(400)
    x = solver.solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)
