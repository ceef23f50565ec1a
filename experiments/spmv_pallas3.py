"""Pallas DIA SpMV tuning round 3 (m=192 halo is only 36864+193).

  P5: TILE 256K + padded carry  (halo ratio 1.28 vs 1.56 at 128K)
  P6: TILE 256K, x passed as 3 pipelined BlockSpec tiles (prev/cur/next) —
      windows assembled in VMEM, DMA double-buffered by the grid pipeline
  P7: TILE 512K + padded carry (VMEM-limit probe)
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

OUT = "/root/repo/experiments/spmv_pallas3_results.jsonl"
K_CHAIN = 100


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def make_mv_dma(n, offsets, K, TILE):
    """Manual-DMA window kernel (P1/P4 design)."""
    L = max(0, -min(offsets))
    R = max(0, max(offsets))

    def mv(vals, vp):
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


def make_mv_3tile(n, offsets, K, TILE):
    """x as prev/cur/next BlockSpec tiles — pipelined by the grid."""
    L = max(0, -min(offsets))
    R = max(0, max(offsets))
    assert L <= TILE and R <= TILE

    def mv(vals, vp_t):
        # vp_t: (n//TILE + 2, TILE) — padded x reshaped with one pad tile on
        # each side so index_map i-1/i/i+1 stays in range
        def kernel(vals_ref, xm_ref, xc_ref, xp_ref, y_ref):
            acc = None
            for k in range(K):
                off = offsets[k]
                # slice [TILE + off, 2*TILE + off) of the concat(xm, xc, xp)
                if off < 0:
                    a = xm_ref[0, TILE + off:]
                    b = xc_ref[0, : TILE + off]
                else:
                    a = xc_ref[0, off:]
                    b = xp_ref[0, :off] if off > 0 else None
                seg = a if b is None else jnp.concatenate([a, b])
                term = vals_ref[k, :] * seg
                acc = term if acc is None else acc + term
            y_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            grid=(n // TILE,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda i: (0, i)),
                pl.BlockSpec((1, TILE), lambda i: (i, 0)),      # prev tile
                pl.BlockSpec((1, TILE), lambda i: (i + 1, 0)),  # current
                pl.BlockSpec((1, TILE), lambda i: (i + 2, 0)),  # next
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
        )(vals, vp_t, vp_t, vp_t)

    return mv


def run_chain(name, chain, args, nnz, n):
    try:
        t0 = time.perf_counter()
        s = float(chain(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        log({"variant": name, "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 2),
             "gnnz_per_s": round(K_CHAIN * nnz / best / 1e9, 2),
             "eff_gbps": round(K_CHAIN * (nnz * 4 + 8 * n) / best / 1e9, 1)})
    except Exception as e:
        log({"variant": name, "error": repr(e)[:300]})


def main():
    m = 192
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    offsets = Ad.offsets
    K = len(offsets)
    nnz = Ad.nnz
    vals_dm = Ad.vals  # already diag-major (K, n)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    for TILE, name in [(1 << 17, "P5b_m192_tile128k_carry")]:
        mv, L, R = make_mv_dma(n, offsets, K, TILE)

        @jax.jit
        def chain(vals, v, mv=mv, L=L, R=R):
            vp = jnp.pad(v, (L, R))

            def body(i, vp):
                y = mv(vals, vp) / 6.0
                return jax.lax.dynamic_update_slice(vp, y, (L,))

            vp = jax.lax.fori_loop(0, K_CHAIN, body, vp)
            return jnp.vdot(vp[L:L + 128], vp[L:L + 128])

        run_chain(name, chain, (vals_dm, x), nnz, n)

    # P6: 3-tile pipelined
    TILE = 1 << 17
    mv3 = make_mv_3tile(n, offsets, K, TILE)
    nt = n // TILE

    @jax.jit
    def chain3(vals, v):
        def body(i, v):
            vp_t = jnp.concatenate(
                [jnp.zeros(TILE, jnp.float32), v, jnp.zeros(TILE, jnp.float32)]
            ).reshape(nt + 2, TILE)
            return mv3(vals, vp_t) / 6.0

        v = jax.lax.fori_loop(0, K_CHAIN, body, v)
        return jnp.vdot(v[:128], v[:128])

    run_chain("P6_m192_tile256k_3tile", chain3, (vals_dm, x), nnz, n)


if __name__ == "__main__":
    main()
