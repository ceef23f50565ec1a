"""End-to-end UNSTRUCTURED AMG-PCG on the real TPU: the 1.03M-row
jittered-Delaunay 3-D elasticity fixture (49.2M nnz, block_size=3), solved
through the public facade — exercises the algebraic path end to end: RCM
permutation, tile-ELL fine level + tile-ELL coarse levels and transfers
(fast single-pass reduce inside the preconditioner), block aggregation,
host-spgemm Galerkin RAP, df64 refinement. The structured probe path cannot
engage here (no grid stencil). Results → amg_unstructured_results.jsonl."""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

OUT = "/root/repo/experiments/amg_unstructured_results.jsonl"


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.linear import Solver

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    b = np.random.default_rng(0).standard_normal(n)
    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 400, "block_size": 3,
                "structured": False, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    setup_s = time.perf_counter() - t0
    setup_phases = {k: round(v, 2) for k, v in (s._hier.timings or {}).items()}
    t0 = time.perf_counter()
    x = s.solve(b)
    first_solve_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = s.solve(b)
    warm_solve_s = time.perf_counter() - t0
    info = s.get_info()
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    # values-only refactorize (pattern reuse; best-of-2 — the first repeat
    # may still compile reuse-path programs), with its own phase split
    refac_s, refac_phases = 1e9, {}
    for _ in range(2):
        t0 = time.perf_counter()
        s.factorize(A)
        dt = time.perf_counter() - t0
        if dt < refac_s:
            refac_s = dt
            refac_phases = {k: round(v, 2)
                            for k, v in (s._hier.timings or {}).items()}
    t0 = time.perf_counter()
    x2 = s.solve(b)
    resolve_s = time.perf_counter() - t0
    rel2 = float(np.linalg.norm(A @ x2 - b) / np.linalg.norm(b))
    log({"experiment": "amg_unstructured_tpu_e2e", "n": n, "nnz": nnz,
         "block_size": 3,
         "setup_s": round(setup_s, 1),
         "setup_phases": setup_phases,
         "level_sizes": s._hier.level_sizes,
         "operator_complexity": round(s._hier.operator_complexity, 2),
         "first_solve_s": round(first_solve_s, 1),
         "warm_solve_s": round(warm_solve_s, 2),
         "refactorize_s": round(refac_s, 1),
         "refactorize_phases": refac_phases,
         "post_refactorize_solve_s": round(resolve_s, 2),
         "post_refactorize_rel": rel2,
         "iterations": int(info["num_iterations"]),
         "rel_residual": rel, "converged": bool(info["converged"]),
         "platform": jax.default_backend()})


if __name__ == "__main__":
    main()
