"""End-to-end AMG-PCG on the real TPU chip: 3D Poisson, 7M DoF, fp32 +
df64 refinement. Validates the full composed stack (native aggregation →
smoothed-aggregation hierarchy → Chebyshev V-cycle with Pallas SpMV → CG)
at production scale."""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import poisson3d  # noqa: E402

OUT = "/root/repo/experiments/amg_tpu_e2e_results.jsonl"


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def main():
    from polysolve_tpu.linear import Solver

    m = 128  # n = 2.097M (full 192^3 setup host-side is heavy; start here)
    t0 = time.perf_counter()
    A = poisson3d(m)
    n = A.shape[0]
    build_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 200, "coarse_enough": 2000,
                "max_levels": 6, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    x = s.solve(b)
    solve_s = time.perf_counter() - t0
    # second solve: jit warm, honest steady-state time
    t0 = time.perf_counter()
    x = s.solve(b)
    solve2_s = time.perf_counter() - t0

    rel = float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))
    info = s.get_info()

    # decompose warm-solve time: the axon tunnel ships b up (2×fp32 df64
    # halves) and x back per solve — measure that round trip alone so the
    # device-side solve cost is explicit
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(2):
        up1 = jax.device_put(jnp.asarray(b, dtype=jnp.float32))
        up2 = jax.device_put(jnp.asarray(b, dtype=jnp.float32))
        jax.block_until_ready((up1, up2))
        _ = np.asarray(up1) + np.asarray(up2)
    transfer_s = (time.perf_counter() - t0) / 2

    log({
        "experiment": "amg_pcg_tpu_e2e",
        "n": n,
        "matrix_build_s": round(build_s, 1),
        "amg_setup_s": round(setup_s, 1),
        "first_solve_s": round(solve_s, 1),
        "warm_solve_s": round(solve2_s, 2),
        "transfer_roundtrip_s": round(transfer_s, 2),
        "device_solve_s_est": round(solve2_s - transfer_s, 2),
        "iterations": info["num_iterations"],
        "iters_per_s_device": round(
            info["num_iterations"] / max(solve2_s - transfer_s, 1e-9), 1),
        "rel_residual": rel,
        "converged": info["converged"],
        "platform": jax.default_backend(),
    })


if __name__ == "__main__":
    main()
