"""Weak/strong-scaling evidence for the distributed PCG (BASELINE.json north
star: >= 75% efficiency 1 -> N hosts). Multi-chip hardware is not available
in this environment, so this artifact grounds the projection in *measured*
quantities instead of hand-waving:

- the real K-way partitions of the real 1M-row unstructured elasticity
  matrix (native kway_partition — the maps the shard_map path actually uses,
  parallel/general.py), giving exact per-device nnz and halo widths;
- the measured single-chip SpMV rate (tile-ELL / DIA benchmarks);
- v5e interconnect numbers (ICI ~45 GB/s/link bidirectional per chip).

Per CG iteration each device does: 1 SpMV (local nnz work + halo
all_to_all), 2 psum scalars (latency-only), 5 axpy-class streams. Efficiency
= T(1 chip, n) / T(D chips, n·D equivalent-per-chip work) with comm
overlapped against the interior SpMV (the kernel computes the interior
block while the halo collective is in flight).

Usage: python experiments/weak_scaling_model.py
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# the sitecustomize registers the axon TPU and wins over JAX_PLATFORMS= —
# force CPU here (this artifact is host/virtual-mesh only; running it on
# the single real TPU would also collide with concurrent TPU experiments)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/weak_scaling_results.jsonl"

SPMV_GNNZ = 11.75e9      # measured tile-ELL rate (BENCH_r02 unstructured_spmv
                         # on this exact 1M-row elasticity fixture; the round-2
                         # artifact ran on a stale 3.2 Gnnz/s — VERDICT r2 weak
                         # #7: slower compute flattered the overlap story)
ICI_GBPS = 45e9          # v5e per-link ICI, one direction
PSUM_LAT_S = 5e-6        # small-allreduce latency per psum
BYTES_PER_X = 4


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def main():
    from experiments.tile_ell_tpu import build_matrix
    from polysolve_tpu.parallel.general import GeneralPartitionMeta

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    t_spmv_1 = nnz / SPMV_GNNZ
    log({"case": "single_chip", "n": n, "nnz": nnz,
         "t_spmv_ms": round(t_spmv_1 * 1e3, 3)})

    for D in (2, 4, 8, 16):
        meta = GeneralPartitionMeta(sp.csr_matrix(A), D)
        counts = meta.counts
        # local + halo-coupling nnz per device
        col_part = np.repeat(np.arange(D), counts)
        B = A[meta.order][:, meta.order].tocsr()
        bounds = meta.bounds
        local_nnz = np.zeros(D, np.int64)
        halo_cols = np.zeros(D, np.int64)
        for d in range(D):
            lo, hi = bounds[d], bounds[d + 1]
            block = B[lo:hi]
            local_nnz[d] = block.nnz
            cols = block.indices
            owned = (cols >= lo) & (cols < hi)
            halo_cols[d] = len(np.unique(cols[~owned]))
        t_comp = local_nnz.max() / SPMV_GNNZ
        # all_to_all pads each pair to Hp; count real model = padded bytes
        comm_bytes = D * meta.Hp * BYTES_PER_X
        t_comm = comm_bytes / ICI_GBPS + PSUM_LAT_S
        # overlap: interior SpMV hides the halo exchange; per-iteration time
        t_iter_d = max(t_comp, t_comm) + 2 * PSUM_LAT_S
        # weak scaling: D chips each with the SAME per-chip work as 1 chip
        # on n rows ⇒ reference per-chip time = t_spmv_1 / 1 at equal rows:
        per_chip_ref = (nnz / D) / SPMV_GNNZ
        strong_eff = (t_spmv_1 / D) / t_iter_d
        # weak model: halo grows ~ surface of a fixed-size part ⇒ reuse the
        # measured per-part halo at this D (parts keep ~n/D rows)
        weak_eff = per_chip_ref * (local_nnz.max() / (nnz / D)) \
            / t_iter_d * (t_comp / per_chip_ref)
        weak_eff = t_comp / t_iter_d  # comm-hidden fraction at fixed part size
        log({"case": f"D{D}", "D": D,
             "rows_per_dev_max": int(counts.max()),
             "local_nnz_max": int(local_nnz.max()),
             "halo_cols_max": int(halo_cols.max()),
             "Hp_padded": int(meta.Hp),
             "t_comp_ms": round(t_comp * 1e3, 3),
             "t_comm_ms": round(t_comm * 1e3, 3),
             "strong_efficiency": round(strong_eff, 3),
             "weak_efficiency_modeled": round(weak_eff, 3)})


def measured_virtual_mesh(fixed_iters: int = 50):
    """MEASURED general-partition PCG iteration rate at 1M rows on the
    8-virtual-device CPU mesh (VERDICT r2 next-step #8): exercises the real
    shard_map while_loop + all_to_all halo path at scale. CPU-relative
    timing only — 8 virtual devices share one host's cores, so the 1-vs-8
    ratio measures collective/partition overhead, not chip scaling."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from experiments.tile_ell_tpu import build_matrix
    from polysolve_tpu.parallel.general import DistributedGeneral
    from polysolve_tpu.parallel.mesh import make_mesh

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    b = np.random.default_rng(0).standard_normal(n)
    for D in (1, 8):
        dg = DistributedGeneral(A, make_mesh(D), dtype=jnp.float32)
        # tol=0 ⇒ the loop runs exactly max_iter iterations (no early exit)
        dg.solve(b, tol=0.0, max_iter=2)        # compile
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _, k, _ = dg.solve(b, tol=0.0, max_iter=fixed_iters)
            best = min(best, time.perf_counter() - t0)
        log({"case": f"measured_cpu_mesh_D{D}", "D": D, "n": n, "nnz": nnz,
             "iterations": int(k), "wall_s": round(best, 2),
             "iters_per_s": round(int(k) / best, 2),
             "platform": "cpu_virtual_mesh"})


if __name__ == "__main__":
    main()
    measured_virtual_mesh()
