"""TPU SpMV layout experiments (run on the real chip, results → JSON lines).

Tested variants on 3D Poisson 7-point, n ≈ 7M, fp32:
  A. DIA row-major (n, K)  — baseline (strided diagonal reads)
  B. DIA diag-major (K, n) — contiguous diagonal reads
  C. DIA diag-major, 2-D reshaped (K, n/512, 512) — lane-tiled
  D. B + x kept unpadded with per-offset roll (no pad copy)

Each variant: one jitted fori_loop chain of 100 matvecs + scalar readback.
Persistent compilation cache enabled to amortize axon's slow remote compile.
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import poisson3d  # noqa: E402
from polysolve_tpu.types import dia_from_scipy  # noqa: E402

OUT = "/root/repo/experiments/spmv_layouts_results.jsonl"
K_CHAIN = 100


def run_variant(name, make_chain, args, nnz, n):
    t0 = time.perf_counter()
    chain = make_chain()
    s = float(chain(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    res = {
        "variant": name,
        "compile_s": round(compile_s, 1),
        "run_ms": round(best * 1e3, 2),
        "gnnz_per_s": round(K_CHAIN * nnz / best / 1e9, 2),
        "eff_gbps_min_model": round(K_CHAIN * (nnz * 4 + 8 * n) / best / 1e9, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def main():
    m = 192
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    offsets = Ad.offsets
    nnz = Ad.nnz
    L = max(0, -min(offsets))
    R = max(0, max(offsets))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), dtype=jnp.float32)
    vals_rm = Ad.vals                                # (n, K)
    vals_dm = jnp.asarray(np.asarray(Ad.vals).T.copy())  # (K, n)

    # A: row-major baseline
    def make_a():
        def mv(vals, v):
            vp = jnp.pad(v, (L, R))
            y = jnp.zeros(n, jnp.float32)
            for k, off in enumerate(offsets):
                y = y + vals[:, k] * jax.lax.slice_in_dim(vp, L + off, L + off + n)
            return y

        @jax.jit
        def chain(vals, v):
            v = jax.lax.fori_loop(0, K_CHAIN, lambda i, v: mv(vals, v) / 6.0, v)
            return jnp.vdot(v[:128], v[:128])
        return chain

    # B: diag-major
    def make_b():
        def mv(vals, v):
            vp = jnp.pad(v, (L, R))
            y = jnp.zeros(n, jnp.float32)
            for k, off in enumerate(offsets):
                y = y + vals[k] * jax.lax.slice_in_dim(vp, L + off, L + off + n)
            return y

        @jax.jit
        def chain(vals, v):
            v = jax.lax.fori_loop(0, K_CHAIN, lambda i, v: mv(vals, v) / 6.0, v)
            return jnp.vdot(v[:128], v[:128])
        return chain

    # C: diag-major with 2-D lane tiling
    def make_c():
        lanes = 512
        n2 = n // lanes  # n divisible (7077888 = 13824*512)

        def mv(vals, v):
            vp = jnp.pad(v, (L, R))
            y = jnp.zeros(n, jnp.float32)
            for k, off in enumerate(offsets):
                y = y + vals[k] * jax.lax.slice_in_dim(vp, L + off, L + off + n)
            return y

        def mv2(vals2, v):
            y = mv(vals2.reshape(len(offsets), n), v)
            return y

        @jax.jit
        def chain(vals2, v):
            v = jax.lax.fori_loop(0, K_CHAIN, lambda i, v: mv2(vals2, v) / 6.0, v)
            return jnp.vdot(v[:128], v[:128])
        return chain

    # D: diag-major, roll instead of pad+slice
    def make_d():
        def mv(vals, v):
            y = jnp.zeros(n, jnp.float32)
            for k, off in enumerate(offsets):
                y = y + vals[k] * jnp.roll(v, -off)
            return y

        @jax.jit
        def chain(vals, v):
            v = jax.lax.fori_loop(0, K_CHAIN, lambda i, v: mv(vals, v) / 6.0, v)
            return jnp.vdot(v[:128], v[:128])
        return chain

    run_variant("A_row_major", make_a, (vals_rm, x), nnz, n)
    run_variant("B_diag_major", make_b, (vals_dm, x), nnz, n)
    run_variant("C_diag_major_2d", make_c,
                (vals_dm.reshape(len(offsets), n // 512, 512), x), nnz, n)
    run_variant("D_diag_major_roll", make_d, (vals_dm, x), nnz, n)


if __name__ == "__main__":
    main()
