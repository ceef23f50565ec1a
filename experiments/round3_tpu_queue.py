"""Round-3 TPU work queue — run serially the moment the chip is back
(only ONE process may use the axon TPU; see CLAUDE.md).

Sections (each guarded, results appended to its own jsonl):
1. tile-ELL kernel variants on the 1M-row elasticity fixture:
   window_mode inline vs dbuf (ADVICE r2 #3: dbuf was interpret-only),
   at (cr=128, st=32, bs=2) — the production config.
2. bench.py equivalent AMG e2e at m=192 with the probed RAP (setup_s,
   iters/s) — validates VERDICT r2 next-steps #2/#3 on hardware.
3. supernodal TPU factorize at n=110k (flat schedule) — VERDICT #6.

Usage: python experiments/round3_tpu_queue.py [sections]
       sections = comma list of {tile,amg,snl}; default all
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
sys.path.insert(0, "/root/repo/experiments")

OUT = "/root/repo/experiments/round3_tpu_results.jsonl"


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def sec_tile():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    M = tile_ell.pack(A, dtype=jnp.float32)
    x2d = tile_ell._pad_x2d(
        M, jnp.asarray(np.random.default_rng(0).standard_normal(n),
                       jnp.float32))
    nrows2d = -(-n // 128)
    K = 100

    for mode in ("inline", "dbuf"):
        @jax.jit
        def chain(vals, r8, q8t, oh8, wb, super_of, x2d, mode=mode):
            def body(i, x2d):
                y = tile_ell._tile_ell_pallas(
                    vals, r8, q8t, oh8, wb, super_of, x2d,
                    M.n_super, M.cr, M.st, M.bs, window_mode=mode)
                return jax.lax.dynamic_update_slice(
                    x2d, (y / jnp.float32(64.0))[: nrows2d * 128].reshape(
                        -1, 128), (0, 0))

            x2d = jax.lax.fori_loop(0, K, body, x2d)
            return jnp.vdot(x2d[0], x2d[0])

        args = (M.vals, M.r8, M.q8t, M.oh8, M.wb, M.super_of, x2d)
        try:
            t0 = time.perf_counter()
            s = float(chain(*args))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                s2 = float(chain(*args))
                best = min(best, time.perf_counter() - t0)
            ok = np.isfinite(s2) and (abs(s - s2) < 1e-3 * max(abs(s), 1.0))
            log({"sec": "tile", "mode": mode, "n": n, "nnz": nnz,
                 "padding": round(M.padding_ratio, 2),
                 "compile_s": round(compile_s, 1),
                 "Gnnz_per_s": round(nnz * K / best / 1e9, 2),
                 "run_ms_per_mv": round(best * 1e3 / K, 2),
                 "deterministic": bool(ok)})
        except Exception as e:
            log({"sec": "tile", "mode": mode, "error": repr(e)[:250]})


def sec_tile2():
    """Supertile-size sweep at the 1M fixture: larger ST packs denser
    (host sweep: padding 2.91 @ st32/bs2 → 2.31 @ st112/bs2, 2.16 @
    st96/bs1) — measure whether the byte cut survives on hardware."""
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    K = 100
    for st, bs in ((112, 2), (96, 1), (120, 2), (64, 2)):
        try:
            M = tile_ell.pack(A, dtype=jnp.float32, st=st, bs=bs)
            x2d = tile_ell._pad_x2d(
                M, jnp.asarray(np.random.default_rng(0).standard_normal(n),
                               jnp.float32))
            nrows2d = -(-n // 128)

            @jax.jit
            def chain(vals, r8, q8t, oh8, wb, super_of, x2d, M=M):
                def body(i, x2d):
                    y = tile_ell._tile_ell_pallas(
                        vals, r8, q8t, oh8, wb, super_of, x2d,
                        M.n_super, M.cr, M.st, M.bs)
                    return jax.lax.dynamic_update_slice(
                        x2d, (y / jnp.float32(64.0))[: nrows2d * 128].reshape(
                            -1, 128), (0, 0))

                x2d = jax.lax.fori_loop(0, K, body, x2d)
                return jnp.vdot(x2d[0], x2d[0])

            args = (M.vals, M.r8, M.q8t, M.oh8, M.wb, M.super_of, x2d)
            t0 = time.perf_counter()
            float(chain(*args))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(*args))
                best = min(best, time.perf_counter() - t0)
            log({"sec": "tile2", "st": st, "bs": bs,
                 "padding": round(M.padding_ratio, 2),
                 "chunks": int(M.vals.shape[0]),
                 "compile_s": round(compile_s, 1),
                 "Gnnz_per_s": round(nnz * K / best / 1e9, 2),
                 "run_ms_per_mv": round(best * 1e3 / K, 2)})
        except Exception as e:
            log({"sec": "tile2", "st": st, "bs": bs,
                 "error": repr(e)[:250]})


def sec_amg():
    from polysolve_tpu.linear import Solver

    m = 192
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    A = sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 200, "coarse_enough": 2000,
                "max_levels": 6, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    setup_s = time.perf_counter() - t0
    probed = all(a[0] is None for a in s._hier.aggregates)
    s.solve(b)
    t0 = time.perf_counter()
    x = s.solve(b)
    solve_s = time.perf_counter() - t0
    info = s.get_info()
    t0 = time.perf_counter()
    s.solve(b, x)
    overhead_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(A)
    refac_s = time.perf_counter() - t0
    iters = max(int(info["num_iterations"]), 1)
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    log({"sec": "amg", "n": n, "setup_s": round(setup_s, 1),
         "probed_rap": probed,
         "refactorize_s": round(refac_s, 1),
         "warm_solve_s": round(solve_s, 2),
         "overhead_s": round(overhead_s, 2),
         "iterations": iters,
         "iters_per_s_device": round(
             iters / max(solve_s - overhead_s, 1e-3), 2),
         "rel_residual": rel, "converged": bool(info["converged"])})


def sec_snl():
    from polysolve_tpu.linear.supernodal import SupernodalCholesky

    m = 48
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m)
    A = sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I) + 0.1 * sp.identity(m ** 3))
    n = A.shape[0]
    s = SupernodalCholesky()
    t0 = time.perf_counter()
    sym = s.analyze(A)
    t_an = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(A)
    t_first = time.perf_counter() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s.factorize(A)
        best = min(best, time.perf_counter() - t0)
    b = np.random.default_rng(0).standard_normal(n)
    t0 = time.perf_counter()
    x = s.solve(b)
    t_sol = time.perf_counter() - t0
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    log({"sec": "snl", "n": n, "nb": sym.nb,
         "steps": int(sym.f_diag.shape[0]),
         "flops_G": round(sym.flops / 1e9, 1),
         "analyze_s": round(t_an, 1), "first_factor_s": round(t_first, 1),
         "refactorize_s": round(best, 2),
         "GFLOPs": round(sym.flops / 1e9 / best, 1),
         "solve_s": round(t_sol, 2), "rel_residual_fp32": rel})


if __name__ == "__main__":
    want = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["tile", "amg", "snl"])
    for name, fn in (("tile", sec_tile), ("tile2", sec_tile2),
                     ("amg", sec_amg), ("snl", sec_snl)):
        if name in want:
            try:
                fn()
            except Exception as e:
                log({"sec": name, "fatal": repr(e)[:250]})
