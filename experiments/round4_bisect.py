"""Bisect the round-4 AMG probe pipeline on the axon TPU: which program
crashes the compile helper (HTTP 500 at amg64)? Run each stage standalone.

Usage: python experiments/round4_bisect.py [stages]
       stages = comma list of {apply,probeall,extract,power}; default all
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/round4_tpu_results.jsonl"


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def build(m=64):
    from polysolve_tpu.types import dia_from_scipy

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    A = sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    d = A.diagonal()
    Dinv = jnp.asarray(1.0 / d, jnp.float32)
    return A, Ad, Dinv, (m, m, m)


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        log({"sec": "bisect", "stage": name,
             "s": round(time.perf_counter() - t0, 1), "ok": True,
             "out": out})
    except Exception as e:  # noqa: BLE001
        log({"sec": "bisect", "stage": name,
             "s": round(time.perf_counter() - t0, 1), "ok": False,
             "err": repr(e)[:300]})


if __name__ == "__main__":
    from polysolve_tpu.linear import amg

    A, Ad, Dinv, grid = build(64)
    n_c = (grid[0] // 2) ** 3
    w = jnp.float32(0.02)
    want = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["power", "apply", "probeall", "extract"])

    cls_host = np.zeros(n_c, dtype=np.int64)
    cg = tuple(g // 2 for g in grid)
    coords = np.unravel_index(np.arange(n_c), cg)
    s_ax = (5, 5, 5)
    for co, s in zip(coords, s_ax):
        cls_host = cls_host * s + (co % s)
    cls_dev = jnp.asarray(cls_host, jnp.int32)

    for wnt in want:
        if wnt == "power":
            v0 = jnp.asarray(np.random.default_rng(0).standard_normal(
                A.shape[0]), jnp.float32)
            stage("power", lambda: float(amg._power_iter_dia(
                Ad, Dinv, v0, iters=20)))
        elif wnt == "apply":
            E = jnp.zeros((amg._PROBE_B, n_c), jnp.float32
                          ).at[0, 0].set(1.0)
            stage("apply", lambda: float(jnp.sum(
                amg._rap_apply_bt(Ad, Dinv, w, E, grid))))
        elif wnt == "probeall":
            stage("probeall", lambda: float(jnp.sum(
                amg._rap_probe_all(Ad, Dinv, w, cls_dev, grid, 4))))
        elif wnt == "extract":
            Y = jnp.asarray(np.random.default_rng(1).standard_normal(
                (128, n_c)), jnp.float32)
            offs = np.zeros(1024, dtype=np.int32)
            offs[:125] = np.arange(125) - 62
            deltas = np.full((1024, 3), 33, dtype=np.int32)
            deltas[:125] = np.stack(np.unravel_index(
                np.arange(125), (5, 5, 5)), axis=1) - 2
            stage("extract", lambda: float(jnp.sum(amg._extract_dia(
                Y, cls_dev, jnp.asarray(offs), jnp.asarray(deltas),
                jnp.asarray(np.stack(coords), jnp.int32),
                jnp.asarray(cg, jnp.int32)))))
