"""Round-4 TPU work queue — run serially (only ONE process may use the axon
TPU; see CLAUDE.md).

Sections (each guarded, results appended to round4_tpu_results.jsonl):
1. mm    — batched DIA SpMM kernel validation: small correctness probe
           (pallas vs jnp) + wide-halo B=1 route. Cheap; run FIRST so a
           Mosaic lowering failure surfaces before the big sections.
2. amg   — bench.py-equivalent AMG e2e at m=192 with the reworked probe
           path: setup split, refactorize-with-plan-reuse, direct device
           iteration rate (VERDICT r3 #1 and #3).
3. amg64 — same at m=64 (fast shake-out of the probe/extract programs
           before the 7M shapes compile).

Usage: python experiments/round4_tpu_queue.py [sections]
       sections = comma list of {mm,amg64,amg}; default mm,amg64,amg
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

OUT = "/root/repo/experiments/round4_tpu_results.jsonl"


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def poisson3d(m):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))


def sec_mm():
    """Correctness of the batched DIA SpMM on hardware (sublane-broadcast
    lowering is the risk), + the wide-halo B=1 matvec route."""
    from polysolve_tpu.ops import spmv as sm
    from polysolve_tpu.types import dia_from_scipy

    m = 32                                    # n = 32768
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.standard_normal((32, n)), jnp.float32)
    t0 = time.perf_counter()
    Yp = np.asarray(sm.pallas_dia_matmat_bt(Ad, Xt))
    compile_s = time.perf_counter() - t0
    Yr = np.asarray(sm.dia_matmat_bt_jnp(Ad, Xt))
    rel = float(np.linalg.norm(Yp - Yr) / np.linalg.norm(Yr))
    log({"sec": "mm", "probe": "matmat_bt_b32", "n": n,
         "compile_s": round(compile_s, 1), "rel_vs_jnp": rel,
         "ok": rel < 1e-5})

    # wide-halo route: offsets beyond any 1-D tile at a non-2^k row count
    offs = [-m * m * 3, -1, 0, 1, m * m * 3]
    diags = [np.full(n - abs(o), 1.0 + i) for i, o in enumerate(offs)]
    W = sp.csr_matrix(sp.diags(diags, offs))
    Wd = dia_from_scipy(W, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    t0 = time.perf_counter()
    yw = np.asarray(sm.matvec(Wd, x))
    compile_s = time.perf_counter() - t0
    ywr = W @ np.asarray(x, np.float64)
    rel = float(np.linalg.norm(yw - ywr) / np.linalg.norm(ywr))
    log({"sec": "mm", "probe": "wide_halo_b1", "n": n,
         "compile_s": round(compile_s, 1), "rel": rel, "ok": rel < 1e-4})


def sec_amg(m):
    """bench.py-equivalent AMG e2e (cold setup -> warm solve -> plan-reuse
    refactorize -> direct device iteration rate)."""
    from polysolve_tpu.linear import Solver
    from polysolve_tpu.linear.iterative import _run_krylov

    A = poisson3d(m)
    n = A.shape[0]
    nnz = A.nnz
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
    phases = {k: round(v, 2) for k, v in (s._hier.timings or {}).items()}
    t0 = time.perf_counter()
    x = s.solve(b)
    first_solve_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = s.solve(b)
    warm_solve_s = time.perf_counter() - t0
    info = s.get_info()
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    refac_s = 1e9
    for _ in range(2):
        # best-of-2: the first repeat may still compile reuse-path programs
        # (shorter power iteration etc); Newton loops refactorize many
        # times, so the steady-state repeat is the honest number
        t0 = time.perf_counter()
        s.factorize(A)
        refac_s = min(refac_s, time.perf_counter() - t0)
    phases2 = {k: round(v, 2) for k, v in (s._hier.timings or {}).items()}

    dtype = s.A_dev.dtype
    b_dev = jnp.asarray(b, dtype=dtype)
    x0_dev = jnp.zeros_like(b_dev)
    zero = jnp.asarray(0.0, dtype=dtype)

    def timed(k_iters):
        best, done = 1e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            res = _run_krylov("CG", s.A_dev, s.pstate, b_dev, x0_dev,
                              zero, jnp.int32(k_iters), atol=zero)
            float(res.error)
            best = min(best, time.perf_counter() - t0)
            done = int(res.iterations)
        return best, done

    timed(10)
    (t10, k10), (t110, k110) = timed(10), timed(110)
    rate = (round((k110 - k10) / (t110 - t10), 1)
            if t110 > t10 and k110 > k10 else None)
    # plausibility floor (VERDICT r4 weak #7: amg64 recorded 28,325 it/s —
    # fp32 rr underflow made both runs converge early and the differential
    # divided noise): an iteration cannot beat ONE fine-level matvec at a
    # generous 150 Gnnz/s — emit null instead of an impossible rate
    min_ms = nnz / 150e9 * 1e3
    if rate and (t110 - t10) / max(k110 - k10, 1) * 1e3 < min_ms:
        rate = None
    log({"sec": f"amg{m}", "n": n, "setup_s": round(setup_s, 1),
         "setup_phases": phases,
         "first_solve_s": round(first_solve_s, 1),
         "warm_solve_s": round(warm_solve_s, 2),
         "refactorize_s": round(refac_s, 2), "refac_phases": phases2,
         "iterations": int(info["num_iterations"]),
         "rel_residual": rel, "converged": bool(info["converged"]),
         "iters_per_s_device": rate, "rate_probe_iters": [k10, k110],
         "ms_per_iter": (round((t110 - t10) / (k110 - k10) * 1e3, 2)
                         if rate else None),
         "level_sizes": s._hier.level_sizes})


def sec_tdiag():
    """tile-ELL stage isolation on the 1M-row elasticity fixture: which
    stage costs the full-vs-stream gap (full 14.1 vs nogather 21.6 Gnnz/s
    in round 3)? diag=nomxu keeps the gather/transpose pipeline and drops
    the one-hot MXU reduce; diag=nogather the reverse."""
    import jax.numpy as _jnp

    sys.path.insert(0, "/root/repo/experiments")
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    M = tile_ell.pack(A, dtype=_jnp.float32)
    x2d = tile_ell._pad_x2d(
        M, _jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        _jnp.float32))
    nrows2d = -(-n // 128)
    K = 100

    for diag in ("full", "nomxu", "nogather", "stream"):
        @jax.jit
        def chain(vals, r8, q8t, dt8, wb, super_of, x2d, diag=diag):
            def body(i, x2d):
                y = tile_ell._tile_ell_pallas(
                    vals, r8, q8t, dt8, wb, super_of, x2d,
                    M.n_super, M.cr, M.st, M.bs, diag=diag)
                return jax.lax.dynamic_update_slice(
                    x2d, (y / _jnp.float32(64.0))[: nrows2d * 128].reshape(
                        -1, 128), (0, 0))

            x2d = jax.lax.fori_loop(0, K, body, x2d)
            return _jnp.vdot(x2d[0], x2d[0])

        args = (M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of, x2d)
        try:
            t0 = time.perf_counter()
            float(chain(*args))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(*args))
                best = min(best, time.perf_counter() - t0)
        except Exception as e:
            # diagnostics fail SOFT (VERDICT r4 weak #9: a lowering crash
            # in one variant left a fatal row in the artifact)
            log({"sec": "tdiag", "diag": diag, "skipped": True,
                 "error": repr(e)[:200]})
            continue
        log({"sec": "tdiag", "diag": diag, "n": n, "nnz": nnz,
             "padding": round(M.padding_ratio, 2),
             "compile_s": round(compile_s, 1),
             "Gnnz_per_s": round(nnz * K / best / 1e9, 2),
             "ns_per_chunk": round(best / K / M.vals.shape[0] * 1e9, 1)})


def sec_tr():
    """transpose_mode vpu vs mxu on the 1M-row fixture: the gather/transpose
    pipeline is the measured bottleneck (tdiag); routing the two (128,128)
    transposes through the MXU may hide them behind the pipeline."""
    import jax.numpy as _jnp

    sys.path.insert(0, "/root/repo/experiments")
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    M = tile_ell.pack(A, dtype=_jnp.float32)
    x = _jnp.asarray(np.random.default_rng(0).standard_normal(n),
                     _jnp.float32)
    x2d = tile_ell._pad_x2d(M, x)
    nrows2d = -(-n // 128)
    K = 100
    y_ref = None

    for tm in ("mxu", "vpu"):
        # correctness first (single apply)
        y = np.asarray(tile_ell._tile_ell_pallas(
            M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of, x2d,
            M.n_super, M.cr, M.st, M.bs, transpose_mode=tm))[:n]
        if y_ref is None:
            y_ref = A @ np.asarray(x, np.float64)
        rel = float(np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref))

        @jax.jit
        def chain(vals, r8, q8t, dt8, wb, super_of, x2d, tm=tm):
            def body(i, x2d):
                y = tile_ell._tile_ell_pallas(
                    vals, r8, q8t, dt8, wb, super_of, x2d,
                    M.n_super, M.cr, M.st, M.bs, transpose_mode=tm)
                return jax.lax.dynamic_update_slice(
                    x2d, (y / _jnp.float32(64.0))[: nrows2d * 128].reshape(
                        -1, 128), (0, 0))

            x2d = jax.lax.fori_loop(0, K, body, x2d)
            return _jnp.vdot(x2d[0], x2d[0])

        args = (M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of, x2d)
        t0 = time.perf_counter()
        float(chain(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        log({"sec": "tr", "transpose_mode": tm, "n": n, "nnz": nnz,
             "padding": round(M.padding_ratio, 2), "rel_vs_host": rel,
             "compile_s": round(compile_s, 1),
             "Gnnz_per_s": round(nnz * K / best / 1e9, 2),
             "ns_per_chunk": round(best / K / M.vals.shape[0] * 1e9, 1)})


def sec_snl(tile, m=48):
    """Supernodal Cholesky at n=m^3: analyze (vectorized host symbolic),
    repeat-factorize wall, flat solve wall — tile 32 vs 64 sweep
    (VERDICT r3 #4: target >=60 GFLOP/s, refactorize <=2 s, solve <=0.1 s)."""
    from polysolve_tpu.linear.supernodal import SupernodalCholesky

    A = sp.csr_matrix(poisson3d(m) + 0.1 * sp.identity(m ** 3))
    n = A.shape[0]
    s = SupernodalCholesky(tile=tile)
    t0 = time.perf_counter()
    sym = s.analyze(A)
    t_an = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(A)
    t_first = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s.factorize(A)
        best = min(best, time.perf_counter() - t0)
    b = np.random.default_rng(0).standard_normal(n)
    s.solve(b)                                  # compile
    t_sol = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        x = s.solve(b)
        t_sol = min(t_sol, time.perf_counter() - t0)
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    log({"sec": "snl", "tile": tile, "n": n, "nb": sym.nb,
         "steps": int(sym.f_diag.shape[0]), "n_levels": sym.n_levels,
         "flops_G": round(sym.flops / 1e9, 1),
         "analyze_s": round(t_an, 1), "first_factor_s": round(t_first, 1),
         "refactorize_s": round(best, 2),
         "GFLOPs": round(sym.flops / 1e9 / best, 1),
         "solve_s": round(t_sol, 3), "rel_residual_fp32": rel})


if __name__ == "__main__":
    want = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["mm", "amg64", "amg"])
    for w in want:
        t0 = time.perf_counter()
        try:
            if w == "mm":
                sec_mm()
            elif w == "amg64":
                sec_amg(64)
            elif w == "amg":
                sec_amg(192)
            elif w == "tr":
                sec_tr()
            elif w == "tdiag":
                sec_tdiag()
            elif w == "snl32":
                sec_snl(32)
            elif w == "snl64":
                sec_snl(64)
            elif w == "snlbig":
                sec_snl(64, m=64)
        except Exception as e:  # noqa: BLE001
            log({"sec": w, "fatal": repr(e)[:300]})
        print(f"[{w}] done in {time.perf_counter() - t0:.1f}s", flush=True)
