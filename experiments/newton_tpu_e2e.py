"""Full-stack Newton on the real TPU: nonlinear Poisson (u-quartic well),
n = 64³ = 262k DoF.

Exercises the whole framework end-to-end the way polyfem drives polysolve:
jax energy/gradient on device, host-assembled sparse Hessian (fixed stencil
pattern), Newton strategy chain with the AMG inner solver — whose hierarchy
is REBUILT VALUES-ONLY each Newton step (pattern-reuse, the optimization the
reference lacks: AMGCL rebuilds fully each factorize, AMGCL.cpp:148-184).

E(u) = ½ uᵀ L u + (λ/4) Σ u⁴ − fᵀ u
∇E   = L u + λ u³ − f
∇²E  = L + 3λ diag(u²)        (same sparsity every step)
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

import jax.numpy as jnp  # noqa: E402

M = 64
LAM = 0.5


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )


def main():
    from polysolve_tpu.nonlinear import Problem, Solver

    n = M ** 3
    L = poisson3d(M)
    rng = np.random.default_rng(0)
    f = rng.standard_normal(n)

    # energy/gradient in float64 on host (O(nnz), the polyfem-style assembly
    # side); the heavy work — the Newton inner solves — runs on the TPU
    class NLPoisson(Problem):
        def value(self, x):
            return float(0.5 * x @ (L @ x) + (LAM / 4.0) * np.sum(x ** 4)
                         - f @ x)

        def gradient(self, x):
            return L @ x + LAM * x ** 3 - f

        def hessian(self, x):
            # fixed pattern: L + 3λ diag(u²) — only values change per step
            return sp.csr_matrix(L + sp.diags(3.0 * LAM * x ** 2))

    solver = Solver.create(
        {"solver": "Newton", "grad_norm": 1e-6, "max_iterations": 30,
         "line_search": {"method": "RobustArmijo"}},
        linear_solver_params={
            "solver": "AMG",
            "AMG": {"tolerance": 1e-7, "max_iter": 300},
        },
    )
    # per-call phase attribution on the inner linear solver (VERDICT r4
    # weak #3: ~5x unattributed facade overhead per Newton step) — wrap at
    # the class level (Newton lazily instantiates its linear solver)
    from polysolve_tpu.linear.iterative import AMGSolver

    phases = {"factorize": [], "solve": [], "hessian": []}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            phases[name].append(round(time.perf_counter() - t0, 2))
            return out
        return wrap

    AMGSolver.factorize = timed("factorize", AMGSolver.factorize)
    AMGSolver.solve = timed("solve", AMGSolver.solve)

    prob = NLPoisson()
    prob.hessian = timed("hessian", prob.hessian)
    x0 = np.zeros(n)
    t0 = time.perf_counter()
    x = solver.minimize(prob, x0)
    total = time.perf_counter() - t0
    info = solver.get_info()
    gn = np.linalg.norm(prob.gradient(x))
    res = {
        "n": n,
        "backend": jax.default_backend(),
        "newton_iterations": info["iterations"],
        "final_grad_norm": float(gn),
        "status": info["status"],
        "total_s": round(total, 1),
        "time_update_direction_per_it": round(info.get(
            "time_update_direction", 0.0), 2),
        "time_obj_fun_per_it": round(info.get("time_obj_fun", 0.0), 3),
        "per_call_s": phases,
    }
    print(json.dumps(res))
    assert gn < 1e-5, gn
    print("NEWTON TPU E2E OK")


if __name__ == "__main__":
    main()
