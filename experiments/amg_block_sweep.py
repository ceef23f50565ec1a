"""Sweep AMG design variants on the (node-blocked-RCM, v2) 81k-dof
unstructured elasticity fixture: strength measure (Vaněk ratio vs row-max
relative), prolongator smoothing (smoothed / filtered / plain), and
near-nullspace content (3 translations vs 6 RBMs). Goal (VERDICT r4 #1):
hierarchy with op complexity ≤ 1.5, per-level coarsening ≥ 3x, CG+AMG ≤ 60
iterations. CPU-only. Results → amg_block_sweep_results.jsonl."""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

OUT = "/root/repo/experiments/amg_block_sweep_results.jsonl"


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)


def rbm_nullspace(pts):
    """6 rigid-body modes for 3-D elasticity with (ux,uy,uz) dof order."""
    p = pts - pts.mean(axis=0)
    p = p / np.abs(p).max()
    nn = len(p)
    B = np.zeros((3 * nn, 6))
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    for c in range(3):
        B[c::3, c] = 1.0
    B[0::3, 3], B[1::3, 3] = -y, x
    B[1::3, 4], B[2::3, 4] = -z, y
    B[0::3, 5], B[2::3, 5] = z, -x
    return B


def run(tag, A, params, block_size, nullspace=None, max_iter=400):
    import jax.numpy as jnp

    from polysolve_tpu import ops
    from polysolve_tpu.linear import amg, krylov

    t0 = time.perf_counter()
    try:
        h = amg.AMGHierarchy.setup(A, params=params, block_size=block_size,
                                   nullspace=nullspace)
    except RuntimeError as e:
        log({"tag": tag, "error": str(e)})
        return
    setup_s = time.perf_counter() - t0
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    A_dev = ops.to_device_matrix(A, dtype=jnp.float64)
    bd = jnp.asarray(b)

    def mv(x):
        return ops.matvec(A_dev, x)

    def pc(r):
        return amg.apply_preconditioner(h.state, r)

    t0 = time.perf_counter()
    res = krylov.cg(mv, bd, jnp.zeros_like(bd), pc, 1e-8, max_iter)
    solve_s = time.perf_counter() - t0
    rel = float(np.linalg.norm(A @ np.asarray(res.x) - b) / np.linalg.norm(b))
    log({"tag": tag, "sizes": h.level_sizes,
         "op_cx": round(h.operator_complexity, 3),
         "setup_s": round(setup_s, 2), "iters": int(res.iterations),
         "rel": rel, "solve_s": round(solve_s, 2),
         "converged": bool(res.converged) and rel < 1e-7})


def main():
    from tile_ell_tpu import build_matrix

    A, pts = build_matrix(30, with_pts=True)
    print(f"n={A.shape[0]} nnz={A.nnz}")
    B6 = rbm_nullspace(pts)
    base = {"structured": False, "max_levels": 8, "tile_ell": "off"}

    which = sys.argv[1:] or ["all"]

    def sel(name):
        return "all" in which or name in which

    if sel("ratio_sf"):
        run("ratio_sf", A, dict(base), 3)
    if sel("rowmax_sf"):
        run("rowmax_sf", A, dict(base, strength="rowmax", eps_strong=0.25), 3)
    if sel("rowmax_sf_t5"):
        run("rowmax_sf_t5", A, dict(base, strength="rowmax", eps_strong=0.5), 3)
    if sel("ratio_plain"):
        run("ratio_plain", A, dict(base, smooth_P=False), 3)
    if sel("rowmax_plain"):
        run("rowmax_plain", A,
            dict(base, strength="rowmax", eps_strong=0.25, smooth_P=False), 3)
    if sel("ratio_nofilter"):
        run("ratio_nofilter", A, dict(base, filter_smooth=False), 3)
    if sel("ratio_sf_rbm"):
        run("ratio_sf_rbm", A, dict(base), 3, nullspace=B6)
    if sel("rowmax_sf_rbm"):
        run("rowmax_sf_rbm", A,
            dict(base, strength="rowmax", eps_strong=0.25), 3, nullspace=B6)


if __name__ == "__main__":
    main()
