"""CPU reproduction of the block-3 unstructured-elasticity AMG coarsening
stall (VERDICT r4 missing #1): build the hierarchy on the 81k-dof
jittered-Delaunay elasticity fixture and report level sizes, operator
complexity, and CG+AMG iteration count. Run with JAX_PLATFORMS forced to cpu
inside the script (the axon sitecustomize overrides the env var)."""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.linear import amg

    A = build_matrix(30)
    n = A.shape[0]
    print(f"n={n} nnz={A.nnz}")
    t0 = time.perf_counter()
    h = amg.AMGHierarchy.setup(
        A, params={"structured": False, "max_levels": 8,
                   "tile_ell": "off"},
        block_size=3)
    setup_s = time.perf_counter() - t0
    print(json.dumps({
        "sizes": h.level_sizes,
        "op_complexity": round(h.operator_complexity, 3),
        "setup_s": round(setup_s, 2),
    }))
    # PCG with the hierarchy as preconditioner
    import jax.numpy as jnp

    from polysolve_tpu.linear import krylov
    from polysolve_tpu import ops

    b = np.random.default_rng(0).standard_normal(n)
    A_dev = ops.to_device_matrix(A, dtype=jnp.float64)
    bd = jnp.asarray(b)

    def mv(x):
        return ops.matvec(A_dev, x)

    def pc(r):
        return amg.apply_preconditioner(h.state, r)

    t0 = time.perf_counter()
    res = krylov.cg(mv, bd, jnp.zeros_like(bd), pc, 1e-8, 400)
    solve_s = time.perf_counter() - t0
    x = res.x
    rel = float(np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b))
    print(json.dumps({"iters": int(res.iterations),
                      "rel_residual": rel,
                      "solve_s": round(solve_s, 2)}))


if __name__ == "__main__":
    main()
