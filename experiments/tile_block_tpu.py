"""Block tile-ELL SpMV on the real TPU: the 1.03M-row / 49M-nnz
unstructured 3-D elasticity fixture as 3×3 blocks on the condensed node
graph (the BSR role — reference MASSolver.cu:198, AMGCL block_value_type).
One gather pipeline pass per component serves 9 nnz/slot; index traffic is
0.22 B/nnz. Chained-fori timing (axon rules). Results →
tile_block_tpu_results.jsonl."""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

OUT = "/root/repo/experiments/tile_block_tpu_results.jsonl"
CHAIN = 100


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    A = build_matrix(nx)
    n, nnz = A.shape[0], A.nnz
    t0 = time.perf_counter()
    M, plan, block_of, offs = tile_ell.pack_block(A, 3, dtype=jnp.float32)
    pack_s = time.perf_counter() - t0
    TC = M.vals.shape[0]
    pad = M.padding_ratio

    x = np.random.default_rng(0).standard_normal(n)
    xp = jnp.asarray(tile_ell.to_planar(x, 3), jnp.float32)
    x2d0 = tile_ell._pad_x2d_block(M, xp)
    nrows = x2d0.shape[0] - tile_ell.WIN     # planar rows actually used

    for mode in ("split2", "fast"):
        leaves = (M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of)

        @jax.jit
        def chain(vals, r8, q8t, dt8, wb, super_of, x2d):
            def body(i, x2d):
                y = tile_ell._tile_block_pallas(
                    vals, r8, q8t, dt8, wb, super_of, x2d,
                    M.n_super, M.cr, M.st, M.bs, M.bdim, reduce_mode=mode)
                y2 = (y / jnp.float32(64.0)).reshape(
                    -1, x2d.shape[1])[: nrows]
                return jax.lax.dynamic_update_slice(x2d, y2, (0, 0))

            x2d = jax.lax.fori_loop(0, CHAIN, body, x2d)
            return jnp.vdot(x2d[0], x2d[0])

        t0 = time.perf_counter()
        s = float(chain(*leaves, x2d0))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*leaves, x2d0))
            best = min(best, time.perf_counter() - t0)
        gnnz = nnz * CHAIN / best / 1e9
        # accuracy single matvec
        y = np.asarray(tile_ell._tile_block_pallas(
            M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of, x2d0,
            M.n_super, M.cr, M.st, M.bs, M.bdim, reduce_mode=mode))
        yb = tile_ell.from_planar(y, n, 3)
        rel = float(np.linalg.norm(yb - A @ x) / np.linalg.norm(A @ x))
        log({"sec": "tile_block", "mode": mode, "nx": nx, "n": n,
             "nnz": nnz, "nnzb": M.nnzb, "TC": TC,
             "padding_blocks": round(pad, 3), "pack_s": round(pack_s, 1),
             "compile_s": round(compile_s, 1),
             "Gnnz_per_s": round(gnnz, 2),
             "ms_per_mv": round(best * 1e3 / CHAIN, 2),
             "rel_err_per_mv": rel,
             "platform": jax.default_backend()})


if __name__ == "__main__":
    main()
