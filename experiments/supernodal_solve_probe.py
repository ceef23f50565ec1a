"""Supernodal triangular-solve cost probe at n=110k (VERDICT r4 #6:
solve ≤ 0.1 s): is the 0.18 s solve MXU-precision-bound (HIGHEST = 6-pass
fp32 dots on tiny per-step GEMMs) or step-latency-bound? Times the flat
scan solve at prec=highest vs default and checks the residual impact.
Results → supernodal_solve_probe_results.jsonl."""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/supernodal_solve_probe_results.jsonl"


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    return sp.csr_matrix(sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
                         + sp.kron(sp.kron(T, I), I))


def main():
    from polysolve_tpu.linear.supernodal import SupernodalCholesky

    m = 48
    A = sp.csr_matrix(poisson3d(m) + 0.1 * sp.identity(m ** 3))
    n = A.shape[0]
    s = SupernodalCholesky(tile=64)
    t0 = time.perf_counter()
    s.analyze(A)
    an_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(A)
    fac_s = time.perf_counter() - t0
    b = np.random.default_rng(0).standard_normal(n)
    for sched in ("tail", "budget"):
        for prec in ("highest",):
            s.solve_precision = prec
            s.solve_schedule = sched
            s.solve(b)                      # compile
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                x = s.solve(b)
                best = min(best, time.perf_counter() - t0)
            rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
            log({"sec": "snl_solve_prec", "n": n, "prec": prec,
                 "sched": sched,
                 "solve_s": round(best, 3), "rel_residual": rel,
                 "analyze_s": round(an_s, 1), "factor_s": round(fac_s, 1),
                 "platform": jax.default_backend()})


if __name__ == "__main__":
    main()
