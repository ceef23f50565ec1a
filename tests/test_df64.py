"""df64 (double-float) arithmetic + mixed-precision refinement tests.

These run with fp32 device math (conftest enables x64 globally, so the df64
module is exercised through its numpy host splits — the same code path used
on real fp32-only TPU hardware). Residual target: the reference's 1e-10
(test_linear_solver.cpp:128) reached without any fp64 device op."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from polysolve_tpu.ops import df64
from polysolve_tpu.types import dia_from_scipy, ell_from_scipy
from conftest import poisson2d


def test_two_sum_exact():
    import jax

    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)
    s, e = df64.two_sum(a, b)
    assert float(s) == 1.0
    assert float(e) == pytest.approx(1e-8, rel=1e-6)


def test_dot_accuracy():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4096)
    b = rng.standard_normal(4096)
    d = df64.dot(df64.from_f64(a), df64.from_f64(b))
    rel = abs(float(df64.to_f64(d)) - a @ b) / abs(a @ b)
    assert rel < 1e-12


def test_mul_add_accuracy():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(512)
    b = rng.standard_normal(512)
    assert np.abs(df64.to_f64(df64.mul(df64.from_f64(a), df64.from_f64(b)))
                  - a * b).max() < 1e-12
    assert np.abs(df64.to_f64(df64.add(df64.from_f64(a), df64.from_f64(b)))
                  - (a + b)).max() < 1e-12


def test_dia_matvec_df():
    A = poisson2d(16)
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A.shape[0])
    y = df64.dia_matvec_df(Ad.vals, Ad.offsets, df64.from_f64(x))
    assert np.abs(df64.to_f64(y) - A @ x).max() < 1e-12


def test_ell_matvec_df():
    rng = np.random.default_rng(3)
    A = sp.csr_matrix(sp.random(300, 300, density=0.05, random_state=1)
                      + sp.identity(300))
    Af32 = A.astype(np.float32).astype(np.float64)  # matrix carries f32 values
    Ad = ell_from_scipy(A, dtype=jnp.float32)
    x = rng.standard_normal(300)
    y = df64.ell_matvec_df(Ad.vals, Ad.cols, df64.from_f64(x))
    assert np.abs(df64.to_f64(y) - Af32 @ x).max() < 1e-11


def test_mixed_precision_refinement_hits_1e10():
    """fp32 CG + df64 residual refinement reaches the reference's fp64-only
    tolerance (the TPU hardware path — SURVEY.md §7 hard-part #4)."""
    import jax

    x64_was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)  # simulate fp32-only device
    try:
        from polysolve_tpu.linear import Solver

        A = poisson2d(20)
        rng = np.random.default_rng(4)
        b = rng.standard_normal(A.shape[0])
        s = Solver.create({"solver": "CG",
                           "CG": {"tolerance": 1e-10, "max_iter": 2000}})
        s.analyze_pattern(A)
        s.factorize(A)
        x = s.solve(b)
        rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
        assert rel < 1e-10, rel
    finally:
        jax.config.update("jax_enable_x64", x64_was)


def test_df64_matvec_value_correction_plane():
    """The fp32 VALUE-representation correction plane (round 4): without
    ``vals_lo`` the df64 SpMV error floors at eps32·‖A‖·‖x‖ on matrices
    whose values are not fp32-exact (every real FEM matrix — measured as a
    6e-5 residual stall on unstructured elasticity); with the plane it is
    df64-grade. Poisson's integer stencils are fp32-exact, which masked
    this until round 4."""
    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from polysolve_tpu.ops import df64 as df
    from polysolve_tpu.types import ell_from_scipy

    rng = np.random.default_rng(11)
    n = 400
    A = sp.random(n, n, density=0.02, random_state=3, format="csr")
    A = sp.csr_matrix(A + A.T + sp.diags(np.full(n, 5.0)))
    A.data = A.data * np.pi          # guarantee fp32-inexact values
    E = ell_from_scipy(A, dtype=jnp.float32)
    data64 = A.data.astype(np.float64)
    A_lo = sp.csr_matrix(
        (data64 - data64.astype(np.float32).astype(np.float64),
         A.indices, A.indptr), shape=A.shape)
    E_lo = ell_from_scipy(A_lo, dtype=jnp.float32)
    x64 = rng.standard_normal(n)
    x_df = df.from_f64(x64)
    x_df = df.DF(jnp.asarray(np.asarray(x_df.hi), jnp.float32),
                 jnp.asarray(np.asarray(x_df.lo), jnp.float32))
    y_exact = A @ x64

    def err(vals_lo):
        y = df.ell_matvec_df(E.vals, E.cols, x_df, vals_lo=vals_lo)
        y64 = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
        return np.linalg.norm(y64 - y_exact) / np.linalg.norm(y_exact)

    e_without = err(None)
    e_with = err(E_lo.vals)
    assert e_without > 1e-9          # the fp32-representation floor
    assert e_with < 1e-12, e_with    # df64-grade with the plane
    assert e_with < e_without / 100
