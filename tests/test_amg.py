"""AMG hierarchy unit tests (setup invariants + convergence quality —
the reference pins AMGCL behavior only end-to-end; these white-box checks
guard the smoothed-aggregation construction, amg.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from polysolve_tpu.linear.amg import AMGHierarchy, cycle, _aggregate
from polysolve_tpu.types import ell_to_scipy
from conftest import poisson2d, poisson3d


def test_hierarchy_shrinks():
    A = poisson2d(40)  # n=1600
    h = AMGHierarchy.setup(A, {"coarse_enough": 50, "max_levels": 6})
    assert len(h.level_sizes) >= 2
    for a, b in zip(h.level_sizes, h.level_sizes[1:]):
        assert b < a  # strict coarsening
    assert h.level_sizes[-1] <= 3 * 50  # coarse level reasonably small
    assert h.operator_complexity < 3.0


def test_aggregation_covers_all():
    A = poisson2d(20)
    agg, n_agg = _aggregate(sp.csr_matrix(A), 0.08)
    assert agg.min() >= 0
    assert agg.max() == n_agg - 1
    assert len(np.unique(agg)) == n_agg
    sizes = np.bincount(agg)
    assert sizes.max() <= 30  # aggregates stay local


def test_galerkin_consistency():
    """A_coarse == Rᵀ A P for the stored device operators (generic algebraic
    path — structured transfers are covered by test_structured_*)."""
    A = sp.csr_matrix(poisson2d(24))
    h = AMGHierarchy.setup(A, {"coarse_enough": 20, "max_levels": 3,
                               "structured": False})
    lev = h.state.levels[0]
    P = ell_to_scipy(lev.P)
    R = ell_to_scipy(lev.R)
    assert abs(R - P.T).max() < 1e-12
    if len(h.state.levels) > 1:
        from polysolve_tpu.types import DenseOpMatrix, DIAMatrix

        A1 = h.state.levels[1].A
        if isinstance(A1, DenseOpMatrix):
            Ac = sp.csr_matrix(np.asarray(A1.vals, dtype=np.float64))
            Ac.eliminate_zeros()
        elif isinstance(A1, DIAMatrix):
            import numpy as _np

            Ac = sp.lil_matrix(A1.shape)
            v = _np.asarray(A1.vals)
            n1 = A1.shape[0]
            for k, off in enumerate(A1.offsets):
                i0, i1 = max(0, -off), min(n1, n1 - off)
                Ac[_np.arange(i0, i1), _np.arange(i0, i1) + off] = v[k, i0:i1]
            Ac = sp.csr_matrix(Ac)
        else:
            Ac = ell_to_scipy(A1)
        Ac_ref = sp.csr_matrix(R @ A @ P)
        assert abs(Ac - Ac_ref).max() < 1e-10


def test_structured_transfers_match_host():
    """Structured (gather-free) T/Tᵀ match the host tentative prolongator."""
    import jax.numpy as jnp

    from polysolve_tpu.linear.amg import (_box_aggregate, _detect_grid,
                                          _t_apply, _tT_apply)
    from conftest import poisson3d

    A = poisson3d(8)
    grid = _detect_grid(sp.csr_matrix(A))
    assert grid == (8, 8, 8)
    agg = _box_aggregate(grid)
    n, nc = A.shape[0], 4 ** 3
    T = sp.csr_matrix((np.full(n, 1 / np.sqrt(8)), (np.arange(n), agg)),
                      shape=(n, nc))
    rng = np.random.default_rng(0)
    zc = rng.standard_normal(nc)
    assert np.abs(np.asarray(_t_apply(grid, jnp.asarray(zc))) - T @ zc).max() < 1e-12
    y = rng.standard_normal(n)
    assert np.abs(np.asarray(_tT_apply(grid, jnp.asarray(y))) - T.T @ y).max() < 1e-12


def test_structured_cycle_converges():
    from conftest import poisson3d
    import jax.numpy as jnp

    A = sp.csr_matrix(poisson3d(16))
    h = AMGHierarchy.setup(A, {"coarse_enough": 40, "max_levels": 6})
    assert all(lev.grid is not None for lev in h.state.levels)  # all structured
    rng = np.random.default_rng(1)
    xt = rng.standard_normal(A.shape[0])
    b = A @ xt
    x = np.zeros(A.shape[0])
    for _ in range(6):
        x = x + np.asarray(cycle(h.state, jnp.asarray(b - A @ x)))
    factor = (np.linalg.norm(x - xt) / np.linalg.norm(xt)) ** (1 / 6)
    assert factor < 0.45, factor


def test_cycle_reduces_error():
    """One V-cycle must reduce the energy-norm error substantially on Poisson
    (the convergence-factor contract that makes AMG-PCG fast)."""
    A = sp.csr_matrix(poisson3d(10))
    n = A.shape[0]
    h = AMGHierarchy.setup(A, {"coarse_enough": 60, "max_levels": 4})
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    x = np.zeros(n)
    errs = [np.linalg.norm(x - x_true)]
    for _ in range(5):
        r = b - A @ x
        x = x + np.asarray(cycle(h.state, jnp.asarray(r)))
        errs.append(np.linalg.norm(x - x_true))
    # average reduction factor well below 1
    factor = (errs[-1] / errs[0]) ** (1 / 5)
    assert factor < 0.35, f"V-cycle factor {factor:.3f}"


def test_cg_amg_iteration_count():
    """AMG-PCG on 3D Poisson converges in O(10) iterations, and the count is
    grid-size-stable (the whole point of multigrid)."""
    from polysolve_tpu.linear import Solver

    iters = {}
    for m in (8, 12):
        A = poisson3d(m)
        rng = np.random.default_rng(1)
        b = rng.standard_normal(A.shape[0])
        s = Solver.create({"solver": "AMG",
                           "AMG": {"tolerance": 1e-10, "max_iter": 200,
                                   "coarse_enough": 50}}, strict=False)
        s.analyze_pattern(A)
        s.factorize(A)
        x = s.solve(b)
        assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-9
        iters[m] = s.get_info()["num_iterations"]
    assert iters[8] <= 30 and iters[12] <= 30
    assert iters[12] <= iters[8] + 10  # near-constant iteration count


def test_block_nullspace_dims():
    """block_size=2 builds 2 coarse dofs per aggregate."""
    from polysolve_tpu.linear.amg import _initial_nullspace, _tentative_prolongator

    B = _initial_nullspace(8, 2, None)
    assert B.shape == (8, 2)
    agg = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    P, Bc, _ = _tentative_prolongator(agg, 2, B)
    assert P.shape == (8, 4)
    assert Bc.shape == (4, 2)
    # tentative P exactly reproduces the nullspace: P @ Bc == B
    assert np.allclose(P @ Bc, B, atol=1e-12)


def test_rbm_nullspace_preserved():
    """User-provided near-nullspace (RBMs) is exactly reproduced by P·Bc
    (the interp_rbms/GM-2 contract, HypreSolver.cpp:191-272)."""
    from polysolve_tpu.linear.amg import _tentative_prolongator

    rng = np.random.default_rng(2)
    n, k = 30, 3
    B = rng.standard_normal((n, k))
    agg = np.repeat(np.arange(6), 5)
    P, Bc, _ = _tentative_prolongator(agg, 6, B)
    assert np.allclose(P @ Bc, B, atol=1e-10)


def test_smoother_option_propagates_and_helps():
    """"smoother" must reach the hierarchy through the facade (regression:
    the nested AMG-precond default block used to override it), and the
    4th-kind Chebyshev smoother (arXiv:2407.09848) must beat the bracketed
    1st-kind on an isotropic Poisson system."""
    import scipy.sparse as sp
    from polysolve_tpu.linear import Solver

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(48, 48))
    I = sp.identity(48)
    A = sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I))
    b = np.random.default_rng(3).standard_normal(A.shape[0])
    iters = {}
    for sm in ("cheb1", "cheb4"):
        s = Solver.create({"solver": "AMG",
                           "AMG": {"tolerance": 1e-10, "max_iter": 300,
                                   "smoother": sm}})
        s.analyze_pattern(A)
        s.factorize(A)
        assert s.pstate.levels[0].smoother == sm
        x = s.solve(b)
        assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)
        iters[sm] = s.get_info()["num_iterations"]
    assert iters["cheb4"] < iters["cheb1"]


def test_amg_tile_ell_path():
    """AMG with tile-ELL levels forced on (the TPU unstructured path, CPU
    interpret here): whole problem RCM-permuted, hierarchy + transfers in
    tile-ELL, solution matches the plain-ELL path."""
    import numpy as np

    from polysolve_tpu import meshgen
    from polysolve_tpu.linear import Solver
    from polysolve_tpu.ops.tile_ell import TileELLBlockMatrix, TileELLMatrix

    pts, cells = meshgen.delaunay_mesh(11, 11, 11, seed=3)
    K = meshgen.elasticity_stiffness(pts, cells)
    b = np.random.default_rng(0).standard_normal(K.shape[0])
    xs = {}
    for mode in ("on", "off"):
        s = Solver.create({"solver": "AMG",
                           "AMG": {"tolerance": 1e-10, "block_size": 3,
                                   "structured": False, "tile_ell": mode}},
                          strict=True)
        s.analyze_pattern(K)
        s.factorize(K)
        if mode == "on":
            # block_size=3 + tile on → the BLOCK tile path (planar level 0)
            assert isinstance(s.A_dev, TileELLBlockMatrix)
            assert s._perm is not None
            lvl0 = s._hier.state.levels[0]
            assert isinstance(lvl0.A, TileELLBlockMatrix)
            assert isinstance(lvl0.P, TileELLMatrix)
        xs[mode] = s.solve(b)
        rel = np.linalg.norm(K @ xs[mode] - b) / np.linalg.norm(b)
        assert rel < 1e-7, (mode, rel)
    assert np.linalg.norm(xs["on"] - xs["off"]) \
        < 1e-6 * np.linalg.norm(xs["off"])


def test_structured_rap_device_probe_parity():
    """Device-probed Galerkin RAP (amg._probe_structured_rap, rap="device")
    vs the host spgemm chain: identical coarse operators (fp64 on CPU) and
    identical solves on a 16^3 Poisson grid."""
    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp

    from polysolve_tpu.linear import Solver
    from polysolve_tpu.ops import matvec

    m = 16
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    A = sp.csr_matrix(sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
                      + sp.kron(sp.kron(T, I), I))
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    sols, hiers = {}, {}
    for rap in ("device", "host"):
        s = Solver.create({"solver": "AMG",
                           "AMG": {"tolerance": 1e-10, "coarse_enough": 60,
                                   "rap": rap}}, strict=True)
        s.analyze_pattern(A)
        s.factorize(A)
        sols[rap] = s.solve(b)
        hiers[rap] = s._hier
        assert np.linalg.norm(A @ sols[rap] - b) < 1e-8, rap
    # the probe path actually engaged (fast-path levels record a None
    # aggregation entry; a silent verification fallback would store arrays)
    assert all(a[0] is None for a in hiers["device"].aggregates),         "device RAP probe fell back to host spgemm"
    assert hiers["device"].level_sizes == hiers["host"].level_sizes
    # coarse operators agree as linear maps (offset sets may order/prune
    # differently — compare action on random vectors)
    rng = np.random.default_rng(1)
    for lev_d, lev_h in zip(hiers["device"].state.levels[1:],
                            hiers["host"].state.levels[1:]):
        z = jnp.asarray(rng.standard_normal(lev_d.A.shape[0]))
        yd = np.asarray(matvec(lev_d.A, z))
        yh = np.asarray(matvec(lev_h.A, z))
        assert np.linalg.norm(yd - yh) < 1e-9 * max(np.linalg.norm(yh), 1.0)
    # coarsest inverse built from the probed operator matches too
    cd = np.asarray(hiers["device"].state.coarse_inv)
    ch = np.asarray(hiers["host"].state.coarse_inv)
    assert np.linalg.norm(cd - ch) < 1e-8 * max(np.linalg.norm(ch), 1.0)
    assert np.linalg.norm(sols["device"] - sols["host"]) \
        < 1e-8 * np.linalg.norm(sols["host"])


def test_structured_rap_probe_plan_reuse():
    """Refactorize with an unchanged pattern reuses the probe plan: the kept
    offset sets (and hence the AMGState treedef / compiled-cycle shapes) are
    identical across factorizes, the probe path stays engaged, and the
    second factorize solves correctly with scaled+perturbed values
    (VERDICT r3 #1 — the Newton-loop refactorize economics)."""
    import numpy as np
    import scipy.sparse as sp

    from polysolve_tpu.linear import Solver

    m = 16
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    A = sp.csr_matrix(sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
                      + sp.kron(sp.kron(T, I), I))
    b = np.random.default_rng(0).standard_normal(A.shape[0])
    s = Solver.create({"solver": "AMG",
                       "AMG": {"tolerance": 1e-10, "coarse_enough": 60,
                               "rap": "device"}}, strict=True)
    s.analyze_pattern(A)
    s.factorize(A)
    x1 = s.solve(b)
    assert np.linalg.norm(A @ x1 - b) < 1e-8
    hier1 = s._hier
    assert hier1.probe_plans and hier1.probe_plans[0] is not None
    assert hier1.timings and "probe_extract_s" in hier1.timings
    offs1 = [lev.A.offsets for lev in hier1.state.levels]

    # same pattern, new values (a Newton-step refactorize)
    A2 = sp.csr_matrix(2.5 * A + 0.01 * sp.identity(A.shape[0]))
    # identity is already in the pattern (diagonal) — pattern unchanged
    assert np.array_equal(A2.indptr, A.indptr)
    assert np.array_equal(A2.indices, A.indices)
    s.factorize(A2)
    x2 = s.solve(b)
    assert np.linalg.norm(A2 @ x2 - b) < 1e-8
    hier2 = s._hier
    # probe path still engaged AND the kept sets match (executable reuse)
    assert all(a[0] is None for a in hier2.aggregates)
    offs2 = [lev.A.offsets for lev in hier2.state.levels]
    assert offs1 == offs2
    for p1, p2 in zip(hier1.probe_plans, hier2.probe_plans):
        if p1 is not None and not p1.dense:
            assert np.array_equal(p1.kept, p2.kept)
