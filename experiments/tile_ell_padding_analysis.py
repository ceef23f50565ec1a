"""Decompose tile-ELL padding (VERDICT r4 weak #1 / task #3): how much of
the measured ~2.3× slot padding is (a) structural (max-row-degree floor per
dest tile), (b) qmap/source-lane conflicts forcing extra slot-rows,
(c) chunk-tail rounding, (d) superchunk window-break padding? CPU-only."""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.ops import tile_ell

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    A = build_matrix(nx)
    n, nnz = A.shape[0], A.nnz
    for bs in (1, 2):
        M = tile_ell.pack(A, cr=128, st=120, bs=bs)
        TC = M.vals.shape[0]
        used = np.asarray(M.vals != 0) | (np.asarray(M.r8) != 0)
        # slot-rows actually used (any lane occupied)
        sr_used = used.any(axis=2)                      # (TC, CR)
        n_sr = int(sr_used.sum())
        fill_in_used = float(np.asarray(M.vals != 0).sum() / max(
            (sr_used.sum() * 128), 1))
        # structural floor: per dest tile, slot-rows >= max row degree
        deg = np.diff(A.indptr)
        LANES = 128
        rows_per = M.st * LANES
        floor_sr = 0
        for S in range(-(-n // rows_per)):
            r0, r1 = S * rows_per, min((S + 1) * rows_per, n)
            dtile = (np.arange(r0, r1) - r0) // LANES
            for t in range(dtile.max() + 1):
                sel = deg[r0:r1][dtile == t]
                if len(sel):
                    floor_sr += int(sel.max())
        res = {
            "nx": nx, "n": n, "nnz": nnz, "bs": bs,
            "padding": round(M.padding_ratio, 3),
            "chunks": TC,
            "slot_rows_used": n_sr,
            "slot_rows_floor_maxdeg": floor_sr,
            "sr_overhead_vs_floor": round(n_sr / max(floor_sr, 1), 3),
            "fill_within_used_rows": round(fill_in_used, 3),
            "chunk_tail_frac": round(1.0 - n_sr / (TC * 128), 3),
            # padding identity: padding = (TC*CR*128)/nnz =
            #   (1/fill_in_used) * (n_sr/(TC*CR)) ... decomposition below
            "padding_from_lane_fill": round(1.0 / max(fill_in_used, 1e-9), 3),
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
