"""Benchmark: SpMV throughput on 3D Poisson (7-point, fp32) on the local
accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the quantitative target is
BASELINE.json's north star — SpMV ≥ 80% of the per-chip HBM roofline in
nnz/s. ``vs_baseline`` = achieved_roofline_fraction / 0.80 (≥ 1.0 ⇒ target
met). The roofline denominator is the *measured* stream-triad bandwidth of
this chip at a working set comparable to the SpMV's (256 MB arrays; the
practical ceiling rises with footprint — 485/567/617 GB/s at 128/256/512 MB,
see BASELINE.md §3 and experiments/stream_ceiling.py). The 819 GB/s paper
number is reported alongside; no measured program reaches it.

Method: the production Pallas DIA kernel (ops/spmv.py), 100 matvecs chained
inside one jitted fori_loop with a scalar readback (host-side timers on the
axon tunnel do not observe async device work — chained timing is the honest
method; see experiments/spmv_*.py).

Roofline model per matvec (diag-major DIA, fp32): vals n·K·4 B, x read
(n + tiles·halo)·4 B (halo windows overlap), y write n·4 B.
"""

from __future__ import annotations

import json
import time

import numpy as np

HBM_GBPS = 819.0  # v5e per-chip HBM bandwidth
TARGET_FRACTION = 0.80  # BASELINE.json north star
M = 192  # grid: n = 7.08M rows, 49.3M nnz
K_CHAIN = 100


def poisson3d(m):
    import scipy.sparse as sp

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from polysolve_tpu.ops import spmv as spmv_mod
    from polysolve_tpu.types import DIAMatrix, dia_from_scipy

    A = poisson3d(M)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    K = len(Ad.offsets)
    nnz = Ad.nnz
    L = max(0, -min(Ad.offsets))
    R = max(0, max(Ad.offsets))

    on_tpu = jax.default_backend() == "tpu"
    tile = spmv_mod._pick_tile(n, K, L + R) if on_tpu else 0

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)

    # measured practical HBM ceiling: chained stream triad
    ns = 1 << 26  # 256 MB arrays: size-matched to the SpMV working set
    xs = jnp.asarray(np.random.default_rng(1).standard_normal(ns), jnp.float32)
    ys = jnp.asarray(np.random.default_rng(2).standard_normal(ns), jnp.float32)

    @jax.jit
    def triad(a, b):
        def body(i, a):
            return a * jnp.float32(0.999) + b

        a = jax.lax.fori_loop(0, K_CHAIN, body, a)
        return jnp.vdot(a[:128], a[:128])

    float(triad(xs, ys))  # compile
    tb_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(triad(xs, ys))
        tb_samples.append(time.perf_counter() - t0)
    tb = float(np.median(tb_samples))
    measured_gbps = K_CHAIN * 3 * 4 * ns / tb / 1e9
    triad_spread = [round(K_CHAIN * 3 * 4 * ns / t / 1e9, 1)
                    for t in sorted(tb_samples)]
    del xs, ys

    def one_mv(vals, v):
        Adev = DIAMatrix(vals=vals, offsets=Ad.offsets, shape=Ad.shape, nnz=nnz)
        return spmv_mod.matvec(Adev, v)

    @jax.jit
    def chain(vals, v):
        def body(i, v):
            return one_mv(vals, v) / 6.0

        v = jax.lax.fori_loop(0, K_CHAIN, body, v)
        return jnp.vdot(v[:128], v[:128])

    t0 = time.perf_counter()
    s = float(chain(Ad.vals, x))
    compile_s = time.perf_counter() - t0
    # median of >=5 timed repeats with min/max spread (VERDICT r4 weak #2:
    # one sample per round made a 4-round slide unattributable — kernel
    # regression vs platform noise)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        s = float(chain(Ad.vals, x))
        samples.append(time.perf_counter() - t0)
    med = float(np.median(samples))

    nnz_per_s = nnz * K_CHAIN / med
    spmv_spread = [round(nnz * K_CHAIN / t / 1e9, 2)
                   for t in sorted(samples)]
    n_tiles = (n // tile) if tile else 1
    bytes_per_mv = 4.0 * (n * K + n + n_tiles * (L + R) + n)
    eff_gbps = bytes_per_mv * K_CHAIN / med / 1e9
    fraction_measured = eff_gbps / measured_gbps
    fraction_paper = eff_gbps / HBM_GBPS

    detail = {
        "n": n,
        "nnz": nnz,
        "effective_GBps": round(eff_gbps, 1),
        "measured_triad_GBps": round(measured_gbps, 1),
        "roofline_fraction_measured": round(fraction_measured, 3),
        "roofline_fraction_paper819": round(fraction_paper, 3),
        "kernel": "pallas_dia" if (on_tpu and tile) else "xla_fused_dia",
        "tile": tile,
        "compile_s": round(compile_s, 1),
        "run_ms_100mv": round(med * 1e3, 1),
        "spread": {"spmv_Gnnz_s_best_to_worst": spmv_spread,
                   "triad_GBps_best_to_worst": triad_spread,
                   "n_samples": len(samples),
                   "stat": "median"},
        "platform": jax.default_backend(),
    }
    # secondary benches never kill (or hang) the primary metric: the remote
    # compile helper sometimes wedges for tens of minutes — SIGALRM-bound.
    # When the helper is unresponsive (probed with a tiny novel program),
    # shrink the budgets so cache-miss sections fail fast instead of each
    # burning its full budget against a dead queue.
    helper_ok = True
    try:
        def _probe():
            import jax as _jax
            import jax.numpy as _jnp

            # per-run salt ⇒ always a FRESH program: a cached hit would not
            # exercise the helper
            salt = np.float32(time.time() % 997)

            @_jax.jit
            def f(v):
                return _jnp.sum(v * np.float32(1.23456789) + salt)

            return float(f(jnp.zeros(128, jnp.float32)))

        _with_deadline(_probe, 120)
    except Exception:
        helper_ok = False
    detail["compile_helper_ok"] = helper_ok
    scale = 1.0 if helper_ok else 0.2
    for key, fn, budget in (
        ("unstructured_spmv", _bench_unstructured, 1200),
        ("amg_pcg", lambda: _bench_amg_pcg(A, x), 1200),
        ("supernodal", _bench_supernodal, 1500),
    ):
        try:
            detail[key] = _with_deadline(fn, max(int(budget * scale), 180))
        except Exception as e:
            detail[key] = {"error": repr(e)[:200]}

    print(json.dumps({
        "metric": "spmv_poisson3d_7pt_fp32",
        "value": round(nnz_per_s / 1e9, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(fraction_measured / TARGET_FRACTION, 3),
        "detail": detail,
    }))


def _with_deadline(fn, seconds: int):
    """Run fn with a SIGALRM deadline (main thread only)."""
    import signal

    def handler(signum, frame):
        raise TimeoutError(f"bench section exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _bench_unstructured():
    """Unstructured SpMV on a ≥1M-row 3-D elasticity matrix (VERDICT r1
    #1: the general-matrix hot kernel, cuSPARSE CSR role). Two formats:
    the BLOCK tile-ELL (3×3 node blocks, planar vectors — what the solver
    actually runs on block systems, reference BSR role) and the scalar
    tile-ELL (the fully general fallback). Both use the accurate two-pass
    reduce."""
    import jax
    import jax.numpy as jnp

    from polysolve_tpu.ops import tile_ell

    import sys

    sys.path.insert(0, "/root/repo")
    from experiments.tile_ell_tpu import build_matrix

    A = build_matrix(70)  # 1.03M rows, 49.2M nnz (cached after first build)
    n, nnz = A.shape[0], A.nnz
    x_host = np.random.default_rng(0).standard_normal(n)

    # ---- block tile-ELL (3×3 node blocks) ----
    Mb, _, _, _ = tile_ell.pack_block(A, 3, dtype=jnp.float32)
    xb = jnp.asarray(tile_ell.to_planar(x_host, 3), jnp.float32)
    x2db = tile_ell._pad_x2d_block(Mb, xb)
    nrows_b = x2db.shape[0] - tile_ell.WIN

    @jax.jit
    def chain_b(vals, r8, q8t, dt8, wb, super_of, x2d):
        def body(i, x2d):
            y = tile_ell._tile_block_pallas(
                vals, r8, q8t, dt8, wb, super_of, x2d,
                Mb.n_super, Mb.cr, Mb.st, Mb.bs, Mb.bdim)
            y2 = (y / jnp.float32(64.0)).reshape(
                -1, x2d.shape[1])[: nrows_b]
            return jax.lax.dynamic_update_slice(x2d, y2, (0, 0))

        x2d = jax.lax.fori_loop(0, K_CHAIN, body, x2d)
        return jnp.vdot(x2d[0], x2d[0])

    args_b = (Mb.vals, Mb.r8, Mb.q8t, Mb.dt8, Mb.wb, Mb.super_of, x2db)
    float(chain_b(*args_b))
    best_b = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain_b(*args_b))
        best_b = min(best_b, time.perf_counter() - t0)

    # ---- scalar tile-ELL (general fallback) ----
    M = tile_ell.pack(A, dtype=jnp.float32)
    x2d = tile_ell._pad_x2d(M, jnp.asarray(x_host, jnp.float32))
    nrows2d = -(-n // 128)

    @jax.jit
    def chain(vals, r8, q8t, dt8, wb, super_of, x2d):
        def body(i, x2d):
            y = tile_ell._tile_ell_pallas(vals, r8, q8t, dt8, wb, super_of,
                                          x2d, M.n_super, M.cr, M.st, M.bs)
            return jax.lax.dynamic_update_slice(
                x2d, (y / jnp.float32(64.0))[: nrows2d * 128].reshape(
                    -1, 128), (0, 0))

        x2d = jax.lax.fori_loop(0, K_CHAIN, body, x2d)
        return jnp.vdot(x2d[0], x2d[0])

    args = (M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of, x2d)
    float(chain(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return {
        "n": n, "nnz": nnz,
        "Gnnz_per_s": round(nnz * K_CHAIN / best_b / 1e9, 2),
        "run_ms_per_mv": round(best_b * 1e3 / K_CHAIN, 2),
        "format": "tile_ell_block3",
        "padding_blocks": round(Mb.padding_ratio, 2),
        "scalar_tile_ell": {
            "padding": round(M.padding_ratio, 2),
            "Gnnz_per_s": round(nnz * K_CHAIN / best / 1e9, 2),
            "run_ms_per_mv": round(best * 1e3 / K_CHAIN, 2),
        },
        "vs_round1_xla_gather_0p13": round(
            nnz * K_CHAIN / best_b / 1e9 / 0.13, 1),
    }


def _bench_supernodal():
    """Supernodal direct Cholesky at >=100k dofs (VERDICT r2 next-step #6):
    TPU repeat-factorize wall + dense-op GFLOP/s via the flat budgeted
    level schedule (linear/supernodal.py _factor_scan_flat). Reference
    role: Pardiso phase 22, Pardiso.cpp:263-293."""
    import scipy.sparse as sp

    from polysolve_tpu.linear.supernodal import SupernodalCholesky

    m = 48                                   # n = 110,592
    A = sp.csr_matrix(poisson3d(m) + 0.1 * sp.identity(m ** 3))
    n = A.shape[0]
    s = SupernodalCholesky(tile=64)          # the at-scale default
    # (direct.py picks 64 for n >= 32768: 251.7 vs 40.5 GFLOP/s measured)
    t0 = time.perf_counter()
    sym = s.analyze(A)
    t_an_cold = time.perf_counter() - t0     # includes native-lib autobuild
    # warm analyze on a FRESH instance: the steady-state symbolic cost
    # (VERDICT r4 weak #5: the ambiguous 11.7 s vs 1.8-2.1 s split)
    s2 = SupernodalCholesky(tile=64)
    t0 = time.perf_counter()
    s2.analyze(A)
    t_an = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.factorize(A)                           # compile + first numeric
    t_first = time.perf_counter() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s.factorize(A)                       # warm repeat (pattern cached)
        best = min(best, time.perf_counter() - t0)
    b = np.random.default_rng(0).standard_normal(n)
    s.solve(b)                               # compile
    t_sol = 1e9
    for _ in range(6):
        # min-of-6: the solve is latency-bound (~0.1 s) and the tunnel
        # adds 20-50 ms of session-dependent dispatch/transfer jitter
        t0 = time.perf_counter()
        x = s.solve(b)
        t_sol = min(t_sol, time.perf_counter() - t0)
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    plan = s._solve_plan or {}
    return {
        "n": n, "nb": sym.nb, "steps": int(sym.f_diag.shape[0]),
        "solve_sched": {
            "kind": "tail",
            "front_levels": plan.get("steps_front"),
            "levels_folded_into_dense_tail": plan.get("steps_folded"),
            "dense_tail_dofs": (plan.get("Td") or 0) * s.tile,
        },
        "tile": s.tile,
        "flops_G": round(sym.flops / 1e9, 1),
        "analyze_cold_s": round(t_an_cold, 1),
        "analyze_warm_s": round(t_an, 1),
        "first_factor_s": round(t_first, 1),
        "refactorize_s": round(best, 2),
        "GFLOPs": round(sym.flops / 1e9 / best, 1),
        "solve_s": round(t_sol, 3),
        "rel_residual_fp32": rel,
    }


def _bench_amg_pcg(A, x_seed):
    """Warm AMG-PCG end-to-end at n=7.08M: iterations/sec (the weak-scaling
    north-star numerator, VERDICT r1 next-step #3). Reports the setup phase
    split (hier.timings) and a DIRECT device iteration rate: the same
    compiled PCG program run at max_iter 10 vs 110 with tol=0 (max_iter is
    a traced argument — no recompile), rate = 100/Δt. This retires both the
    round-3 overhead-subtraction estimator and the 0.2 s-floor lower bound
    (VERDICT r3 #3)."""
    import jax.numpy as jnp

    from polysolve_tpu.linear import Solver
    from polysolve_tpu.linear.iterative import _run_krylov

    n = A.shape[0]
    b = np.asarray(x_seed, np.float64)[:n]
    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 200, "coarse_enough": 2000,
                "max_levels": 6, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    setup_s = time.perf_counter() - t0
    setup_phases = {k: round(v, 2) for k, v in (s._hier.timings or {}).items()}
    s.solve(b)                      # compile + first solve
    t0 = time.perf_counter()
    x = s.solve(b)                  # warm
    solve_s = time.perf_counter() - t0
    info = s.get_info()
    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    iters = max(int(info["num_iterations"]), 1)
    # probe-plan-reuse refactorize (same pattern, new values — the
    # Newton-loop optimization; the reference rebuilds AMGCL fully,
    # AMGCL.cpp:148-184)
    refac_s, refac_phases = 1e9, {}
    for _ in range(3):
        # best-of-3: the first repeat may still compile reuse-path programs
        # (shorter power iteration etc), and the axon platform shows ~1.8x
        # whole-run speed swings between sessions; Newton loops refactorize
        # many times, so the steady-state best is the honest number
        t0 = time.perf_counter()
        s.factorize(A)
        dt = time.perf_counter() - t0
        if dt < refac_s:
            refac_s = dt
            refac_phases = {k: round(v, 2)
                            for k, v in (s._hier.timings or {}).items()}
    # measured tunnel H2D bandwidth: refactorize re-uploads the (K, n) fp32
    # values plane (~198 MB at 7.08M) and the axon tunnel runs anywhere
    # from ~15 to ~60+ MB/s between sessions — the async upload is absorbed
    # by the first blocking readback (it surfaces as a power_s/untimed
    # spike). A real TPU host pays ~20 ms over PCIe for the same bytes, so
    # the ex-upload estimate is the hardware-portable refactorize number.
    up = np.random.default_rng(3).standard_normal(16 << 20).astype(np.float32)
    up_bw = None
    for _ in range(2):                  # 1st may compile the probe vdot
        t0 = time.perf_counter()
        v = jnp.asarray(up)
        float(jnp.vdot(v[:128], v[:128]))
        up_bw = up.nbytes / (time.perf_counter() - t0)
    vals_bytes = int(np.prod(s.A_dev.vals.shape)) * 4
    est_upload_s = vals_bytes / max(up_bw, 1.0)
    out = {
        "n": n, "setup_s": round(setup_s, 1),
        "refactorize_same_pattern_s": round(refac_s, 1),
        "tunnel_upload_MBps": round(up_bw / 1e6, 1),
        "vals_upload_MB": round(vals_bytes / 1e6, 1),
        "refactorize_ex_upload_est_s": round(
            max(refac_s - est_upload_s, 0.0), 1),
        "setup_phases_s": setup_phases,
        # phases of the BEST refactorize (VERDICT r4: the old report mixed
        # the last refactorize's phases into "setup_phases_s")
        "refactorize_phases_s": refac_phases,
        "warm_solve_s": round(solve_s, 2),
        "iterations": iters,
        "iters_per_s_wall": round(iters / solve_s, 2),
        "rel_residual": rel,
        "converged": bool(info["converged"]),
    }
    # direct device iteration rate: fixed-iteration runs of the SAME
    # compiled while_loop (tol=0 disables the residual exit)
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
            done = int(res.iterations)   # fp32 rr can underflow to exact 0
        return best, done                # before max_iter — use REAL counts

    timed(10)                        # compile (tol/max_iter are traced)
    (t10, k10), (t110, k110) = timed(10), timed(110)
    if t110 > t10 and k110 > k10:
        ms_it = (t110 - t10) / (k110 - k10) * 1e3
        # plausibility floor: an iteration cannot beat one fine matvec at
        # a generous 150 Gnnz/s (VERDICT r4 weak #7 floor-artifact guard)
        if ms_it >= A.nnz / 150e9 * 1e3:
            out["iters_per_s_device"] = round(
                (k110 - k10) / (t110 - t10), 1)
            out["device_ms_per_iter"] = round(ms_it, 2)
            out["rate_probe_iters"] = [k10, k110]
    return out


if __name__ == "__main__":
    main()
