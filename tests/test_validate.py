"""Debug invariant checks (polysolve_tpu/validate.py — the sanitizer-layer
analog of the reference's GraphPartition.cpp:22-174 debug validation)."""

import numpy as np
import pytest
import scipy.sparse as sp

from polysolve_tpu import validate as V


def poisson2d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(sp.kron(I, T) + sp.kron(T, I))


def test_check_graph_ok():
    A = poisson2d(8)
    off = sp.csr_matrix(A - sp.diags(A.diagonal()))
    off.eliminate_zeros()
    V.check_graph(off)


def test_check_graph_asymmetric_raises():
    A = sp.csr_matrix(np.array([[0.0, 1.0], [0.0, 0.0]]))
    with pytest.raises(V.ValidationError, match="symmetric"):
        V.check_graph(A)


def test_check_graph_self_loop_raises():
    A = sp.identity(4, format="csr")
    with pytest.raises(V.ValidationError, match="self-loops"):
        V.check_graph(A, require_symmetric=False)


def test_check_partition():
    V.check_partition(np.array([0, 1, 1, 2]), k=3, max_part_size=2)
    with pytest.raises(V.ValidationError, match="cap"):
        V.check_partition(np.array([0, 0, 0, 1]), k=2, max_part_size=2)
    with pytest.raises(V.ValidationError, match="ids"):
        V.check_partition(np.array([0, 5]), k=2)


def test_halo_symmetry():
    V.check_halo_symmetry(poisson2d(8), n_shards=4)
    A = poisson2d(8).tolil()
    A[0, 60] = 1.0  # one-sided long-range coupling
    with pytest.raises(V.ValidationError, match="asymmetric"):
        V.check_halo_symmetry(sp.csr_matrix(A), n_shards=4)


def test_spd_hint():
    V.check_spd_hint(poisson2d(6) + 0.1 * sp.identity(36))
    with pytest.raises(V.ValidationError, match="diagonal"):
        V.check_spd_hint(-poisson2d(6))


def test_nan_guard_passes_and_catches():
    import jax.numpy as jnp

    ok = V.nan_guard(lambda x: x * 2.0, "double")
    np.testing.assert_allclose(np.asarray(ok(jnp.ones(4))), 2.0)
    bad = V.nan_guard(lambda x: x / 0.0, "div")
    with pytest.raises(FloatingPointError, match="div"):
        bad(jnp.ones(4))
