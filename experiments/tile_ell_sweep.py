"""Tile-ELL perf sweep on TPU: CR in {32, 64, 128} + stream-only floor.

Usage: python experiments/tile_ell_sweep.py [small|big]
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from experiments.tile_ell_tpu import build_matrix  # noqa: E402

OUT = "/root/repo/experiments/tile_ell_tpu_results.jsonl"
SIZE = sys.argv[1] if len(sys.argv) > 1 else "small"
CHAIN = 50


def log(res):
    res["experiment"] = "tile_ell_sweep"
    res["size"] = SIZE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def run(A, cr, st=16, bs=1, stream_only=False, wmode='inline'):
    from polysolve_tpu.ops import tile_ell

    t0 = time.perf_counter()
    M = tile_ell.pack(A, dtype=jnp.float32, cr=cr, st=st, bs=bs)
    pack_s = time.perf_counter() - t0
    n = A.shape[0]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    x2d = tile_ell._pad_x2d(M, x)
    nrows2d = -(-n // 128)

    @jax.jit
    def chain(vals, r8, q8t, oh8, wb, super_of, x2d):
        def body(i, x2d):
            y = tile_ell._tile_ell_pallas(vals, r8, q8t, oh8, wb, super_of,
                                          x2d, M.n_super, cr, st, bs,
                                          stream_only, wmode)
            y2 = y / jnp.float32(64.0)
            return jax.lax.dynamic_update_slice(
                x2d, y2[: nrows2d * 128].reshape(-1, 128), (0, 0))

        x2d = jax.lax.fori_loop(0, CHAIN, body, x2d)
        return jnp.vdot(x2d[0], x2d[0])

    args = (M.vals, M.r8, M.q8t, M.oh8, M.wb, M.super_of, x2d)
    try:
        t0 = time.perf_counter()
        float(chain(*args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        TC = M.vals.shape[0]
        log({"cr": cr, "st": st, "bs": bs, "wmode": wmode,
             "stream_only": stream_only, "chunks": TC,
             "padding": round(M.padding_ratio, 2),
             "pack_s": round(pack_s, 1), "compile_s": round(compile_s, 1),
             "run_ms_per_mv": round(best * 1e3 / CHAIN, 2),
             "us_per_chunk": round(best * 1e6 / CHAIN / TC, 3),
             "Gnnz_per_s": round(A.nnz * CHAIN / best / 1e9, 2)})
    except Exception as e:
        log({"cr": cr, "stream_only": stream_only, "error": repr(e)[:250]})


def main():
    nx = 30 if SIZE == "small" else 70
    A = build_matrix(nx)
    print("n:", A.shape[0], "nnz:", A.nnz, flush=True)
    run(A, 128, 32, bs=2, wmode="dbuf")
    run(A, 128, 32, bs=2)


if __name__ == "__main__":
    main()
