"""Pallas DIA SpMV tuning round 2.

P1 (m=192, TILE=128K): 84 Gnnz/s = 434 GB/s eff (53% of 819 GB/s roofline).
Suspects: unaligned lane shifts (offsets ±1, ±192, ±36864), pad copy of x
every matvec, serialized x-window DMA.

  P2: m=256 → offsets ±1, ±256, ±65536 (4/6 shifts lane-aligned)
  P3: P2 + TILE 256K
  P4: P2 + padded carry (pad once outside the chain, kernel emits padded y)
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import poisson3d  # noqa: E402
from polysolve_tpu.types import dia_from_scipy  # noqa: E402

OUT = "/root/repo/experiments/spmv_pallas2_results.jsonl"
K_CHAIN = 100


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def build(m):
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    vals_dm = jnp.asarray(np.asarray(Ad.vals).T.copy())
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    return A, n, Ad, vals_dm, x


def make_mv(n, offsets, K, TILE):
    L = max(0, -min(offsets))
    R = max(0, max(offsets))

    def mv(vals, vp):
        """vp already padded (n + L + R); returns unpadded y (n,)."""

        def kernel(vals_ref, xp_hbm, y_ref, xwin, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(
                xp_hbm.at[pl.ds(i * TILE, TILE + L + R)], xwin, sem)
            cp.start()
            cp.wait()
            acc = vals_ref[0, :] * xwin[L + offsets[0]: L + offsets[0] + TILE]
            for k in range(1, K):
                acc = acc + vals_ref[k, :] * xwin[L + offsets[k]: L + offsets[k] + TILE]
            y_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            grid=(n // TILE,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda i: (0, i)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
            scratch_shapes=[
                pltpu.VMEM((TILE + L + R,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(vals, vp)

    return mv, L, R


def run(name, A, n, Ad, vals_dm, x, TILE, padded_carry=False):
    offsets = Ad.offsets
    K = len(offsets)
    nnz = Ad.nnz
    mv, L, R = make_mv(n, offsets, K, TILE)

    if padded_carry:
        @jax.jit
        def chain(vals, v):
            vp = jnp.pad(v, (L, R))

            def body(i, vp):
                y = mv(vals, vp) / 6.0
                # re-pad by writing into the carried buffer (slice update)
                return jax.lax.dynamic_update_slice(vp, y, (L,))

            vp = jax.lax.fori_loop(0, K_CHAIN, body, vp)
            return jnp.vdot(vp[L:L + 128], vp[L:L + 128])
    else:
        @jax.jit
        def chain(vals, v):
            def body(i, v):
                return mv(vals, jnp.pad(v, (L, R))) / 6.0

            v = jax.lax.fori_loop(0, K_CHAIN, body, v)
            return jnp.vdot(v[:128], v[:128])

    try:
        t0 = time.perf_counter()
        s = float(chain(vals_dm, x))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(chain(vals_dm, x))
            best = min(best, time.perf_counter() - t0)
        log({"variant": name, "n": n, "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 2),
             "gnnz_per_s": round(K_CHAIN * nnz / best / 1e9, 2),
             "eff_gbps": round(K_CHAIN * (nnz * 4 + 8 * n) / best / 1e9, 1)})
    except Exception as e:
        log({"variant": name, "error": repr(e)[:400]})


def main():
    A, n, Ad, vals_dm, x = build(256)  # n = 16.78M, offsets aligned-ish
    run("P2_m256_tile128k", A, n, Ad, vals_dm, x, 1 << 17)
    run("P3_m256_tile256k", A, n, Ad, vals_dm, x, 1 << 18)
    run("P4_m256_padded_carry", A, n, Ad, vals_dm, x, 1 << 17, padded_carry=True)
    # correctness on the P2 kernel
    mv, L, R = make_mv(n, Ad.offsets, len(Ad.offsets), 1 << 17)
    y = mv(vals_dm, jnp.pad(x, (L, R)))
    xs = np.asarray(x, dtype=np.float64)
    err = float(np.abs(np.asarray(y, np.float64) - A @ xs).max() /
                np.abs(A @ xs).max())
    log({"variant": "P2_correctness", "rel_err": err})


if __name__ == "__main__":
    main()
