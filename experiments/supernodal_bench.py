"""Factorization-throughput benchmark (VERDICT r1 next-step #7 'done'
condition): supernodal Cholesky numeric-phase time vs n, 3-D Poisson and an
unstructured elasticity mesh, with the level-scheduled batched scan.

Logs: n, nb, scan steps (vs nb sequential), batch width, numeric GFLOP/s.

Usage: python experiments/supernodal_bench.py [cpu|tpu]
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/supernodal_bench_results.jsonl"


def log(res):
    res["platform"] = jax.default_backend()
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))


def run(name, A):
    from polysolve_tpu.linear.supernodal import SupernodalCholesky

    A = sp.csr_matrix(A)
    n = A.shape[0]
    s = SupernodalCholesky()
    t0 = time.perf_counter()
    sym = s.analyze(A)
    an_s = time.perf_counter() - t0
    # numeric phase: first call compiles; repeats are the honest number
    t0 = time.perf_counter()
    s.factorize(A)
    first_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s.factorize(A)
        best = min(best, time.perf_counter() - t0)
    b = np.random.default_rng(0).standard_normal(n)
    t0 = time.perf_counter()
    x = s.solve(b)
    solve_s = time.perf_counter() - t0
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    log({"case": name, "n": n, "nb": sym.nb,
         "steps": int(sym.sched_k.shape[0]), "Bc": sym.batch_width,
         "n_levels": sym.n_levels, "analyze_s": round(an_s, 1),
         "first_factor_s": round(first_s, 1),
         "factor_s": round(best, 3),
         "GFLOPs": round(sym.flops / best / 1e9, 1),
         "solve_s": round(solve_s, 3), "rel_residual": rel})


def main():
    from polysolve_tpu import meshgen

    run("poisson3d_13k", poisson3d(24) + 0.05 * sp.identity(24 ** 3))
    run("poisson3d_32k", poisson3d(32) + 0.05 * sp.identity(32 ** 3))
    pts, cells = meshgen.delaunay_mesh(14, 14, 14, seed=2)
    run("elast3d_8k", meshgen.elasticity_stiffness(pts, cells))
    pts, cells = meshgen.delaunay_mesh(22, 22, 22, seed=2)
    run("elast3d_32k", meshgen.elasticity_stiffness(pts, cells))


if __name__ == "__main__":
    main()
