"""TPU validation: supernodal Cholesky factorize+solve on the axon chip.

fp32 device math + float64 iterative refinement must hit reference-grade
residuals (< 1e-8, test_linear_solver.cpp:162). Times the numeric phase via
repeat-calls (compile cached after the first).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )


def main():
    from polysolve_tpu.linear import Solver

    print("backend:", jax.default_backend())
    m = 16
    A = sp.csr_matrix(poisson3d(m) + 0.1 * sp.identity(m ** 3))
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    s = Solver.create("SparseCholesky")
    t0 = time.perf_counter()
    s.analyze_pattern(A, n)
    t_an = time.perf_counter() - t0
    print(f"analyze: {t_an:.2f}s mode={s.mode}")

    t0 = time.perf_counter()
    s.factorize(A)
    t_f1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(sp.csr_matrix(1.5 * A))
    t_f2 = time.perf_counter() - t0
    print(f"factorize: first {t_f1:.1f}s (incl compile), repeat {t_f2:.2f}s")

    t0 = time.perf_counter()
    x = s.solve(b)
    t_s1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = s.solve(b)
    t_s2 = time.perf_counter() - t0
    res = np.linalg.norm(1.5 * A @ x - b) / np.linalg.norm(b)
    print(f"solve: first {t_s1:.1f}s, repeat {t_s2:.2f}s, relres {res:.2e}")
    print(json.dumps({"n": n, "mode": s.mode, "relres": float(res),
                      "t_factor_repeat_s": t_f2, "t_solve_repeat_s": t_s2,
                      "info": {k: v for k, v in s.get_info().items()
                               if k != "factor_flops"}}))
    assert res < 1e-8, res
    print("TPU SUPERNODAL OK")


if __name__ == "__main__":
    main()
