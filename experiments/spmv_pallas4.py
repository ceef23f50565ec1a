"""Pallas DIA SpMV tuning round 4.

  B0: stream triad z = x + y via XLA (calibrates the *practical* HBM ceiling
      on this chip — the 819 GB/s paper number may not be reachable)
  B1: same triad as a Pallas kernel
  P6b: x as 3 pipelined 1-D BlockSpec tiles (prev/cur/next)
  P8: manual-DMA window kernel with double-buffered prefetch (slot i+1's
      window DMA starts before slot i's compute)
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

OUT = "/root/repo/experiments/spmv_pallas4_results.jsonl"
K_CHAIN = 100


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def run_chain(name, chain, args, bytes_per_iter):
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
             "gbps": round(K_CHAIN * bytes_per_iter / best / 1e9, 1)})
        return best
    except Exception as e:
        log({"variant": name, "error": repr(e)[:300]})
        return None


def main():
    # ---------------- B0/B1: stream triad ---------------- #
    ns = 1 << 25  # 33.5M f32 = 134 MB per array
    xs = jnp.asarray(np.random.default_rng(1).standard_normal(ns), jnp.float32)
    ys = jnp.asarray(np.random.default_rng(2).standard_normal(ns), jnp.float32)

    @jax.jit
    def triad(x, y):
        def body(i, x):
            return x * jnp.float32(0.999) + y
        x = jax.lax.fori_loop(0, K_CHAIN, body, x)
        return jnp.vdot(x[:128], x[:128])

    run_chain("B0_triad_xla", triad, (xs, ys), 3 * 4 * ns)

    TT = 1 << 17

    def triad_pallas_mv(x, y):
        def kernel(x_ref, y_ref, o_ref):
            o_ref[:] = x_ref[:] * jnp.float32(0.999) + y_ref[:]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ns,), jnp.float32),
            grid=(ns // TT,),
            in_specs=[pl.BlockSpec((TT,), lambda i: (i,)),
                      pl.BlockSpec((TT,), lambda i: (i,))],
            out_specs=pl.BlockSpec((TT,), lambda i: (i,)),
        )(x, y)

    @jax.jit
    def triad_pallas(x, y):
        def body(i, x):
            return triad_pallas_mv(x, y)
        x = jax.lax.fori_loop(0, K_CHAIN, body, x)
        return jnp.vdot(x[:128], x[:128])

    run_chain("B1_triad_pallas", triad_pallas, (xs, ys), 3 * 4 * ns)
    del xs, ys

    # ---------------- SpMV variants ---------------- #
    m = 192
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    offsets = Ad.offsets
    K = len(offsets)
    nnz = Ad.nnz
    vals = Ad.vals  # (K, n) diag-major
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    TILE = 1 << 17
    nt = n // TILE
    spmv_bytes = 4 * (n * K + 2 * n + nt * (max(offsets) - min(offsets)))

    # P6b: 3 pipelined 1-D tiles
    def mv_3tile(vals, vp):
        # vp: (TILE + n + TILE,) — one pad tile each side
        def kernel(vals_ref, xm, xc, xp_, y_ref):
            acc = None
            for k in range(K):
                off = offsets[k]
                if off < 0:
                    seg = jnp.concatenate([xm[TILE + off:], xc[: TILE + off]])
                elif off > 0:
                    seg = jnp.concatenate([xc[off:], xp_[:off]])
                else:
                    seg = xc[:]
                term = vals_ref[k, :] * seg
                acc = term if acc is None else acc + term
            y_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda i: (0, i)),
                pl.BlockSpec((TILE,), lambda i: (i,)),
                pl.BlockSpec((TILE,), lambda i: (i + 1,)),
                pl.BlockSpec((TILE,), lambda i: (i + 2,)),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
        )(vals, vp, vp, vp)

    @jax.jit
    def chain6(vals, v):
        def body(i, v):
            vp = jnp.concatenate([jnp.zeros(TILE, jnp.float32), v,
                                  jnp.zeros(TILE, jnp.float32)])
            return mv_3tile(vals, vp) / 6.0
        v = jax.lax.fori_loop(0, K_CHAIN, body, v)
        return jnp.vdot(v[:128], v[:128])

    run_chain("P6b_3tile_1d", chain6, (vals, x), spmv_bytes)

    # P8: double-buffered manual DMA
    L = max(0, -min(offsets))
    R = max(0, max(offsets))
    WIN = TILE + L + R

    def mv_dbuf(vals, vp):
        def kernel(vals_ref, xp_hbm, y_ref, win, sems):
            i = pl.program_id(0)

            def dma(slot, idx):
                return pltpu.make_async_copy(
                    xp_hbm.at[pl.ds(idx * TILE, WIN)], win.at[slot], sems.at[slot])

            @pl.when(i == 0)
            def _():
                dma(0, 0).start()

            @pl.when(i + 1 < nt)
            def _():
                dma((i + 1) % 2, i + 1).start()

            dma(i % 2, i).wait()
            w = win[i % 2]
            acc = vals_ref[0, :] * w[L + offsets[0]: L + offsets[0] + TILE]
            for k in range(1, K):
                acc = acc + vals_ref[k, :] * w[L + offsets[k]: L + offsets[k] + TILE]
            y_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((K, TILE), lambda i: (0, i)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
            scratch_shapes=[
                pltpu.VMEM((2, WIN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(vals, vp)

    @jax.jit
    def chain8(vals, v):
        def body(i, v):
            return mv_dbuf(vals, jnp.pad(v, (L, R))) / 6.0
        v = jax.lax.fori_loop(0, K_CHAIN, body, v)
        return jnp.vdot(v[:128], v[:128])

    run_chain("P8_dbuf_dma", chain8, (vals, x), spmv_bytes)

    # correctness of P8
    y = mv_dbuf(vals, jnp.pad(x, (L, R)))
    ref = A @ np.asarray(x, np.float64)
    err = float(np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max())
    log({"variant": "P8_correctness", "rel_err": err})


if __name__ == "__main__":
    main()
