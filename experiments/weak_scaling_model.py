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


def _latest_spmv_rate() -> float:
    """Model constant = the NEWEST measured tile-ELL rate on this fixture
    (VERDICT r3 #6: the round-3 model ran on round-2 rates). Reads the
    round-4 results file when present; falls back to BENCH_r03's 14.06."""
    import re

    best = None
    for path in ("/root/repo/experiments/tile_block_tpu_results.jsonl",
                 "/root/repo/experiments/round4_tpu_results.jsonl",
                 "/root/repo/experiments/round3_tpu_results.jsonl"):
        if os.path.exists(path):
            for line in open(path):
                m = re.search(r'"Gnnz_per_s": ([0-9.]+)', line)
                production = ('"sec": "tile' in line
                              or '"transpose_mode": "vpu"' in line
                              or '"diag": "full"' in line)
                if m and production:
                    # max over production rows: a trailing diagnostic or a
                    # slower rerun must not silently become the constant
                    # (ADVICE r4 low #3)
                    best = max(best or 0.0, float(m.group(1)))
            if best:
                return best * 1e9
    return 12.44e9


SPMV_GNNZ = _latest_spmv_rate()
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
        # on n rows ⇒ reference per-chip time = t_spmv_1 / 1 at equal rows
        strong_eff = (t_spmv_1 / D) / t_iter_d
        # weak model: halo grows ~ surface of a fixed-size part ⇒ the
        # comm-hidden fraction at fixed part size
        weak_eff = t_comp / t_iter_d
        log({"case": f"D{D}", "D": D, "spmv_gnnz_constant": SPMV_GNNZ / 1e9,
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


def measured_comm_split(D: int = 8, fixed_iters: int = 50):
    """MEASURED per-iteration compute/comm decomposition on the virtual mesh
    (VERDICT r3 #6): time the SAME general-partition PCG at D devices with
    the real all_to_all halo exchange vs a collective-stubbed variant (the
    halo gather/scatter flops retained, only the collective removed). The
    difference is the collective's wall share. CPU-relative only — virtual
    devices share one host's cores — but it decomposes the measured D-device
    iteration instead of asserting the model."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from experiments.tile_ell_tpu import build_matrix
    import polysolve_tpu.parallel.general as G
    from polysolve_tpu.parallel.mesh import make_mesh

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    b = np.random.default_rng(0).standard_normal(n)

    def timed(dg):
        dg.solve(b, tol=0.0, max_iter=2)        # compile
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _, k, _ = dg.solve(b, tol=0.0, max_iter=fixed_iters)
            best = min(best, time.perf_counter() - t0)
        return best, int(k)

    t_full, k = timed(G.DistributedGeneral(A, make_mesh(D),
                                           dtype=jnp.float32))

    orig = G._local_matvec

    def _nocomm(ci, vi, ce, ve, sidx, smask, x_loc, axis):
        send = x_loc[sidx] * smask.astype(x_loc.dtype)
        halo = send.reshape(-1)                  # collective removed; the
        y = jnp.sum(vi * x_loc[ci], axis=1)      # gather/scatter flops stay
        return y + jnp.sum(ve * halo[ce], axis=1)

    G._local_matvec = _nocomm
    try:
        t_nocomm, _ = timed(G.DistributedGeneral(A, make_mesh(D),
                                                 dtype=jnp.float32))
    finally:
        G._local_matvec = orig
    t_comm = max(t_full - t_nocomm, 0.0)
    # validity: on an oversubscribed host the stubbed variant can measure
    # SLOWER than the full one (scheduler noise exceeds the collective's
    # cost) — the decomposition is then NOT interpretable and the row says
    # so instead of reporting comm_share 0.0 as if measured (VERDICT r4
    # weak #6)
    valid = t_nocomm < t_full
    log({"case": f"measured_comm_split_D{D}", "D": D, "n": n, "nnz": nnz,
         "iterations": k, "wall_full_s": round(t_full, 2),
         "wall_nocomm_s": round(t_nocomm, 2),
         "valid": valid,
         "comm_ms_per_iter": (round(t_comm / k * 1e3, 3) if valid else None),
         "compute_ms_per_iter": (round(t_nocomm / k * 1e3, 3)
                                 if valid else None),
         "comm_share": (round(t_comm / max(t_full, 1e-12), 3)
                        if valid else None),
         "note": (None if valid else
                  "host oversubscription: nocomm >= full; decomposition "
                  "not interpretable on the virtual mesh"),
         "platform": "cpu_virtual_mesh"})


def comm_bytes_check(D: int = 8):
    """Invariant check (VERDICT r4 next #8): the bytes the REAL
    all_to_all moves per SpMV — read off the DistributedGeneral send
    buffer actually shipped to devices — must equal the analytic model's
    comm term (D·Hp·4 B per device per exchange). This pins the model's
    comm numerator to the executed program without needing multi-chip
    hardware."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from experiments.tile_ell_tpu import build_matrix
    import polysolve_tpu.parallel.general as G
    from polysolve_tpu.parallel.mesh import make_mesh

    A = build_matrix(70)
    n, nnz = A.shape[0], A.nnz
    meta = G.GeneralPartitionMeta(sp.csr_matrix(A), D)
    dg = G.DistributedGeneral(A, make_mesh(D), dtype=jnp.float32)
    # per-device send buffer: (D_dest, Hp) fp32 — exactly what
    # lax.all_to_all exchanges once per matvec (general.py _local_matvec)
    sidx = np.asarray(dg.sidx)
    per_dev_bytes = int(sidx.shape[-2] * sidx.shape[-1]) * BYTES_PER_X
    model_bytes = int(D * meta.Hp * BYTES_PER_X)
    log({"case": f"comm_bytes_check_D{D}", "D": D, "n": n, "nnz": nnz,
         "Hp": int(meta.Hp),
         "alltoall_send_bytes_per_dev_per_mv": per_dev_bytes,
         "model_comm_bytes_per_dev_per_mv": model_bytes,
         "matches_model": per_dev_bytes == model_bytes})
    assert per_dev_bytes == model_bytes, (per_dev_bytes, model_bytes)


if __name__ == "__main__":
    # truncate: superseded rows from earlier rounds mixed model vintages
    # (VERDICT r3 weak #8) — every row below is regenerated with the
    # constants current at run time
    open(OUT, "w").close()
    main()
    comm_bytes_check()
    measured_virtual_mesh()
    measured_comm_split()
