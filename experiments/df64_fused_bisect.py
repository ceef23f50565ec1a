"""Bisect ladder for the round-4 toolchain fault: the FUSED df64
refinement program (df64 while_loop + inner CG + AMG cycle over tile-ELL
kernels) crashed the TPU worker at ~1M rows, while each constituent
program ran alone (VERDICT r4 next #7).

ROUND-5 RESOLUTION (df64_fused_bisect_results.jsonl "summary" row):
the crash shape was REMOVED from production — tile-ELL/block formats now
refine through exact host-fp64 residual sweeps (_solve_refined_block;
equal-or-better accuracy, 5.2e-12 at 1M unstructured), so
_run_krylov_df64 only accepts ELL/DIA residual companions. On that class
the fused device program WORKS at ≥1M rows: the 7.08M structured AMG-PCG
bench solve reaches 2.5e-12 through it (BENCH_r05 amg_pcg). The
amg_block/amg_scalar rungs below therefore log "path_removed" (the
crash-prone program is no longer constructible); the jacobi rungs execute
the surviving fused path end-to-end.

Each probe runs in a SUBPROCESS so a worker crash is survivable and the
outcome is logged before the next probe. Run LAST in a TPU session.

Usage:
  python experiments/df64_fused_bisect.py           # full bisect ladder
  python experiments/df64_fused_bisect.py one <nx> <variant>
"""

import json
import os
import subprocess
import sys
import time

OUT = "/root/repo/experiments/df64_fused_bisect_results.jsonl"


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)


def run_one(nx: int, variant: str):
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp  # noqa: E402

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/experiments")
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.linear import Solver
    from polysolve_tpu.linear import iterative as it
    from polysolve_tpu.ops import df64 as df
    from polysolve_tpu.types import ELLMatrix

    A = build_matrix(nx)
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    precond = "AMG" if "amg" in variant else "Jacobi"
    cfg = {"solver": "CG",
           "CG": {"tolerance": 1e-10, "max_iter": 60, "tile_ell": "on",
                  "refine_df64": "off"}}
    if precond == "AMG":
        cfg = {"solver": "AMG",
               "AMG": {"tolerance": 1e-10, "max_iter": 60,
                       "tile_ell": "on", "refine_df64": "off",
                       "block_size": 3, "structured": False,
                       "tile_ell_block": ("off" if "scalar" in variant
                                          else "auto")}}
    s = Solver.create(cfg, strict=False)
    s.analyze_pattern(A)
    s.factorize(A)
    # assemble the fused call exactly as _solve_refined_block would
    B = b.reshape(-1, 1)
    if s._perm is not None:
        B = B[s._perm]
    if getattr(s, "_planar", None) is not None:
        Bp = np.zeros((s._planar["n_pad"], 1))
        Bp[s._planar["inv"]] = B
        B = Bp
    dtype = s.A_dev.dtype
    A_res = s.A_res if s.A_res is not None else s.A_dev
    b_df = df.from_f64(B[:, 0])
    try:
        x_hi, x_lo, itn, err, conv = it._run_krylov_df64(
            "CG", isinstance(A_res, ELLMatrix), s.A_dev, A_res, s.pstate,
            b_df.hi, b_df.lo, jnp.zeros(B.shape[0], dtype=dtype),
            jnp.asarray(1e-10, dtype), jnp.asarray(1e-6, dtype),
            jnp.int32(60), max_outer=4, restart=30,
            vals_lo=getattr(s, "A_res_lo", None))
    except (AttributeError, TypeError) as e:
        # round 5 removed the crash-prone tile-format fused path from
        # production (host-fp64 residual sweeps replace it) — the df64
        # residual impl only accepts ELL/DIA companions now
        print(json.dumps({"path_removed": True, "error": repr(e)[:160]}))
        return
    print(json.dumps({"inner_iters": int(itn), "err": float(err),
                      "converged": bool(conv)}))


def main():
    ladder = [
        (30, "fused_cg_jacobi_tile"),    # 81k scalar tile, Jacobi
        (30, "fused_cg_amg_scalar"),     # 81k scalar tile + AMG cycle
        (30, "fused_cg_amg_block"),      # 81k block tile + AMG cycle
        (48, "fused_cg_amg_scalar"),     # 330k
        (70, "fused_cg_jacobi_tile"),    # 1M scalar tile, Jacobi only
        (70, "fused_cg_amg_scalar"),     # 1M — the known crash shape
        (70, "fused_cg_amg_block"),      # 1M block path
    ]
    for nx, variant in ladder:
        log({"sec": "df64_bisect", "nx": nx, "variant": variant,
             "status": "attempting"})
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one",
             str(nx), variant],
            capture_output=True, text=True, timeout=3600)
        out = (p.stdout or "").strip().splitlines()
        tail = out[-1] if out else ""
        log({"sec": "df64_bisect", "nx": nx, "variant": variant,
             "status": "ok" if p.returncode == 0 else "CRASH/FAIL",
             "rc": p.returncode, "wall_s": round(time.perf_counter() - t0, 1),
             "result": tail[:300],
             "stderr_tail": (p.stderr or "")[-300:]})
        if p.returncode != 0:
            # a worker crash can wedge the helper for later probes — note
            # and continue; callers should treat later rows with suspicion
            log({"sec": "df64_bisect", "note": "continuing after failure; "
                 "helper state may be degraded for subsequent probes"})


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]), sys.argv[3])
    else:
        main()
