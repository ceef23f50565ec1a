"""Tile-ELL unstructured SpMV on the real TPU (VERDICT r1 #1 'done' check:
an unstructured FEM matrix >= 1M rows sustaining a healthy fraction of the
stream ceiling).

Builds a genuinely unstructured 3-D elasticity stiffness (jittered Delaunay,
3 dofs/node), RCM-orders it, packs composite tile-ELL, and times the Pallas
kernel with the chained-fori_loop method. Matrix cached to npz.

Usage: python experiments/tile_ell_tpu.py [small|big]
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
import scipy.sparse as sp  # noqa: E402
from scipy.sparse.csgraph import reverse_cuthill_mckee  # noqa: E402

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/tile_ell_tpu_results.jsonl"
SIZE = sys.argv[1] if len(sys.argv) > 1 else "small"
CHAIN = 50


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def build_matrix(nx, with_pts=False):
    """3-D jittered-Delaunay elasticity stiffness, NODE-blocked RCM order.
    v2 fixed the original cache's DOF-level RCM (broke 1.6% of the 3-dof
    node triples and scrambled component order — fatal for block_size=3
    condensation); v3 adds meshgen's default cell-quality floor (raw
    jittered Delaunay kept 1e5×-stiffness slivers no real mesher emits).
    ``with_pts`` also returns the node coordinates in the permuted order
    (for RBM near-nullspace vectors)."""
    cache = f"/root/repo/experiments/elast3d_{nx}_v3.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        A = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                          shape=tuple(d["shape"]))
        return (A, d["pts"]) if with_pts else A
    from polysolve_tpu import meshgen

    pts, cells = meshgen.delaunay_mesh(nx, nx, nx, seed=7)
    A = meshgen.elasticity_stiffness(pts, cells)
    A = sp.csr_matrix(A)
    dof_perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    # node-blocked: nodes ordered by first appearance in the dof RCM,
    # components kept in (x, y, z) order within each node
    nodes = dof_perm // 3
    _, first = np.unique(nodes, return_index=True)
    node_order = nodes[np.sort(first)]
    perm = (node_order[:, None] * 3 + np.arange(3)[None, :]).ravel()
    A = A[perm][:, perm].tocsr()
    pts = np.asarray(pts)[node_order]
    np.savez(cache, data=A.data, indices=A.indices, indptr=A.indptr,
             shape=np.asarray(A.shape), pts=pts)
    return (A, pts) if with_pts else A


def main():
    from polysolve_tpu.ops import tile_ell

    nx = 30 if SIZE == "small" else 70  # 70^3 nodes -> 1.03M dofs
    t0 = time.perf_counter()
    A = build_matrix(nx)
    build_s = time.perf_counter() - t0
    n, nnz = A.shape[0], A.nnz

    t0 = time.perf_counter()
    M = tile_ell.pack(A, dtype=jnp.float32)
    pack_s = time.perf_counter() - t0
    TC = M.vals.shape[0]
    pad = M.padding_ratio

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    leaves = (M.vals, M.r8, M.q8t, M.oh8, M.wb, M.super_of)
    x2d0 = tile_ell._pad_x2d(M, x)
    nrows2d = -(-n // 128)

    @jax.jit
    def chain(vals, r8, q8t, oh8, wb, super_of, x2d):
        def body(i, x2d):
            y = tile_ell._tile_ell_pallas(vals, r8, q8t, oh8, wb, super_of,
                                          x2d, M.n_super, M.cr, M.st, M.bs)
            return jax.lax.dynamic_update_slice(
                x2d, (y / jnp.float32(64.0))[: nrows2d * 128].reshape(
                    -1, 128), (0, 0))

        x2d = jax.lax.fori_loop(0, CHAIN, body, x2d)
        return jnp.vdot(x2d[0], x2d[0])

    t0 = time.perf_counter()
    s = float(chain(*leaves, x2d0))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(chain(*leaves, x2d0))
        best = min(best, time.perf_counter() - t0)

    # correctness: one matvec vs scipy
    y = np.asarray(tile_ell.tile_ell_matvec_pallas(M, x))
    xref = np.asarray(x, np.float64)
    err = float(np.linalg.norm(y - A @ xref)
                / np.linalg.norm(A @ xref))

    gnnz = nnz * CHAIN / best / 1e9
    # HBM bytes per matvec: slots*(4+1+1) + windows + y
    n_windows = int(np.sum(np.asarray(M.wb)[1:] != np.asarray(M.wb)[:-1]) + 1)
    bytes_mv = TC * M.cr * 128 * 6 + n_windows * 128 * 128 * 4 \
        + M.n_super * M.st * 128 * 4
    log({"experiment": "tile_ell_spmv_tpu", "size": SIZE, "n": n, "nnz": nnz,
         "chunks": TC, "padding": round(pad, 2), "err": err,
         "build_s": round(build_s, 1), "pack_s": round(pack_s, 1),
         "compile_s": round(compile_s, 1),
         "run_ms_per_mv": round(best * 1e3 / CHAIN, 2),
         "Gnnz_per_s": round(gnnz, 2),
         "effective_GBps": round(bytes_mv * CHAIN / best / 1e9, 1),
         "platform": jax.default_backend()})


if __name__ == "__main__":
    main()
