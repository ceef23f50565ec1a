"""Profile the AMG cycle per component on the TPU (VERDICT r1 next-step #3:
find where the ~350 ms/device-iteration at n=7M goes — the raw matvec bound
predicts ~10-30 ms).

Times, each as a chained fori_loop ending in a scalar (the only honest
method through the axon tunnel):
  - the full preconditioner cycle
  - each level's A matvec, smoother, restrict, prolong
  - the coarsest dense lu_solve

Usage: python experiments/amg_cycle_profile.py [m]   (grid, default 128)
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/amg_cycle_profile_results.jsonl"
M = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CHAIN = 20


def log(res):
    res["experiment"] = "amg_cycle_profile"
    res["m"] = M
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def timed(name, fn, x, extra=None):
    """fn: x -> array; chained CHAIN times, scalar readback."""

    @jax.jit
    def chain(x):
        def body(i, x):
            y = fn(x)
            # renormalize so the chain neither under- nor overflows
            return y / jnp.maximum(jnp.sqrt(jnp.vdot(y[:128], y[:128])),
                                   jnp.float32(1e-30))

        x = jax.lax.fori_loop(0, CHAIN, body, x)
        return jnp.vdot(x[:128], x[:128])

    try:
        t0 = time.perf_counter()
        float(chain(x))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(chain(x))
            best = min(best, time.perf_counter() - t0)
        rec = {"component": name, "ms_per_apply": round(best * 1e3 / CHAIN, 3),
               "compile_s": round(compile_s, 1)}
        if extra:
            rec.update(extra)
        log(rec)
    except Exception as e:  # keep profiling the rest
        log({"component": name, "error": repr(e)[:200]})


def main():
    from polysolve_tpu.linear import Solver
    from polysolve_tpu.linear import amg as amg_mod
    from polysolve_tpu.ops import spmv as ops

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(M, M))
    I = sp.identity(M, dtype=np.float64)
    A = sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))
    n = A.shape[0]
    print("n", n, "nnz", A.nnz, flush=True)

    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 200, "coarse_enough": 2000,
                "max_levels": 6, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    log({"component": "setup", "ms_per_apply": None,
         "setup_s": round(time.perf_counter() - t0, 1)})
    state = s.pstate

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)

    timed("cycle_full", lambda x: amg_mod.cycle(state, x), r)

    for l, lev in enumerate(state.levels):
        nl = lev.A.shape[0]
        xl = jnp.asarray(rng.standard_normal(nl), jnp.float32)
        K = len(lev.A.offsets) if hasattr(lev.A, "offsets") else -1
        timed(f"L{l}_matvec", lambda x, lev=lev: ops.matvec(lev.A, x), xl,
              {"n": nl, "K": K, "fmt": type(lev.A).__name__})
        timed(f"L{l}_smooth", lambda x, lev=lev: amg_mod._smooth(lev, x), xl)
        timed(f"L{l}_restrict", lambda x, lev=lev: amg_mod._r_apply(lev, x),
              xl)
        nc = (state.levels[l + 1].A.shape[0] if l + 1 < len(state.levels)
              else state.coarse_lu.shape[0])
        xc = jnp.asarray(rng.standard_normal(nc), jnp.float32)
        timed(f"L{l}_prolong", lambda x, lev=lev: amg_mod._p_apply(lev, x),
              xc)

    ncoarse = state.coarse_lu.shape[0]
    xc = jnp.asarray(rng.standard_normal(ncoarse), jnp.float32)
    timed("coarse_lu_solve",
          lambda x: jax.scipy.linalg.lu_solve((state.coarse_lu,
                                               state.coarse_piv), x), xc,
          {"n": ncoarse})


if __name__ == "__main__":
    main()
