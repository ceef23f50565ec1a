"""Benchmark: SpMV throughput + PCG iteration rate on 3D Poisson.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the quantitative target
is the BASELINE.json north star: SpMV ≥ 80% of the HBM roofline in nnz/s per
chip. ``vs_baseline`` is therefore achieved_roofline_fraction / 0.80 —
vs_baseline ≥ 1.0 means the north-star target is met.

Roofline model (DIA format, fp32): per SpMV the chip must move
  vals: 4 B/nnz  +  x: 4·n·K/(n·K) = 4 B/nnz (each x element read once per
  diagonal)  +  y write: 4·n B total
→ bytes/nnz ≈ 8 + 4/K. v5e-class HBM ≈ 819 GB/s.
"""

from __future__ import annotations

import json
import time

import numpy as np


HBM_GBPS = 819.0  # v5e HBM bandwidth (per chip)
TARGET_FRACTION = 0.80  # BASELINE.json north star


def poisson3d(m):
    import scipy.sparse as sp

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    I = sp.identity(m, dtype=np.float64)
    return sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I)
    )


def main():
    import jax
    import jax.numpy as jnp

    from polysolve_tpu.types import dia_from_scipy, dia_matvec

    m = 192  # n = 7.08M rows, 49.4M nnz (7-point stencil)
    A = poisson3d(m)
    n = A.shape[0]
    Ad = dia_from_scipy(A, dtype=jnp.float32)
    K = len(Ad.offsets)
    nnz = Ad.nnz

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)

    mv = jax.jit(lambda vals, v: dia_matvec(
        type(Ad)(vals=vals, offsets=Ad.offsets, shape=Ad.shape, nnz=Ad.nnz), v))

    # warm up (compile)
    y = mv(Ad.vals, x)
    jax.block_until_ready(y)

    # timed: chain matvecs to avoid host round-trips
    reps = 50
    t0 = time.perf_counter()
    v = x
    for _ in range(reps):
        v = mv(Ad.vals, v)
    jax.block_until_ready(v)
    dt = time.perf_counter() - t0

    nnz_per_s = nnz * reps / dt
    bytes_per_nnz = 8.0 + 4.0 / K
    roofline_nnz_per_s = HBM_GBPS * 1e9 / bytes_per_nnz
    fraction = nnz_per_s / roofline_nnz_per_s

    print(json.dumps({
        "metric": "spmv_poisson3d_7pt_fp32",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(fraction / TARGET_FRACTION, 3),
        "detail": {
            "n": n,
            "nnz": nnz,
            "diagonals": K,
            "roofline_Gnnz_per_s": round(roofline_nnz_per_s / 1e9, 1),
            "roofline_fraction": round(fraction, 3),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
