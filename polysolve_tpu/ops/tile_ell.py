"""Tile-ELL: the TPU-native unstructured-sparse format + SpMV kernel.

This is the general-matrix hot kernel — the role of cuSPARSE CSR SpMV in the
reference's MAS PCG loop (reference CuSparseWrapper.hpp:13-60,
MASSolver.cu:469-595) — for matrices with no exploitable diagonal structure
(DIA covers stencils; this covers everything else).

Design (probed on TPU v5e, experiments/gather_probe*.py):

Mosaic lowers ``jnp.take_along_axis`` only for equal-shape src/idx; both the
lane crossbar (axis=1) and the arbitrary per-lane sublane gather (axis=0) are
fast at (·,128). The format is built around exactly those two primitives:

- rows map to **lanes**: row ``128·t + l`` is lane ``l`` of row-tile ``t``;
- ``x`` is viewed as ``x2d = x.reshape(S, 128)``; a column index ``c``
  splits into (segment ``c // 128``, source lane ``c % 128``);
- a **composite slot-row** holds ≤128 nnz (one per destination lane) plus a
  per-source-lane segment map ``q[ρ]``: the slot at dest lane ``l`` may
  fetch x entry ``(q[ρ], ρ)`` for any ``ρ`` — two entries in one slot-row
  conflict only if they need *different segments from the same source lane*;
- slot-rows are grouped into **chunks** of CR=32; all segments referenced by
  a chunk fit one 128-row window of ``x2d`` (guaranteed by splitting each
  row-tile into ≤120-segment window groups after RCM ordering).

SpMV per chunk is four vectorized ops (sublane gather beyond one vreg
crashes this Mosaic build — experiments/gather_bisect.py — so the
composite-row select runs as a lane gather on the *transposed* window,
with ``q`` stored pre-transposed):
  ``G    = take_along_axis(Xᵀ, pad(qᵀ), 1)``      (lane gather, (128,128))
  ``comp = Gᵀ[:CR]``                              (composite rows)
  ``g    = take_along_axis(comp, r, 1)``          (lane crossbar)
  ``y_tile += sum(vals * g, axis=0)``
where ``Xᵀ`` is transposed once per 128-row x window (amortized over the
window's chunks). ``vals`` (f32) and ``q``/``r`` (int8) stream from HBM
through the Pallas grid pipeline — 6 bytes of HBM traffic per slot; measured
padding on unstructured 3-D elasticity is ~1.9×, i.e. ~11 bytes/nnz.

The first-fit packer (numpy here, native C++ fast path in
cpp/host_kernels.cpp) uses a per-dest-lane monotone cursor: a lane's entries
fill slot-rows in nondecreasing order, so placement is amortized O(1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from flax import struct

from polysolve_tpu.types import default_dtype


LANES = 128
CR_DEFAULT = 32   # slot-rows per chunk (pack-time knob)
WIN = 128         # x2d rows per chunk window
GROUP_SPAN = 120  # max segment span of a window group (8-align slack)


@struct.dataclass
class TileELLMatrix:
    """Chunked composite tile-ELL device matrix (see module docstring).

    Fields (TC = total chunk count)
    -----
    vals   : (TC, CR, 128) float — slot values (0 = padding)
    r8     : (TC, CR, 128) int8  — source lane of each slot's column
    q8t    : (TC, 128, CR) int8  — per-(source-lane, slot-row) segment,
                                    relative to the chunk window base
                                    (TRANSPOSED: fed to the lane gather on Xᵀ)
    wb     : (TC,)         int32 — chunk window base row of x2d (8-aligned)
    tile_of: (TC,)         int32 — owning row-tile of each chunk (sorted)
    shape  : static (n, m) of the original matrix
    nnz    : static true nnz
    """

    vals: jnp.ndarray
    r8: jnp.ndarray
    q8t: jnp.ndarray
    wb: jnp.ndarray
    tile_of: jnp.ndarray
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    cr: int = struct.field(pytree_node=False, default=32)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_tiles(self) -> int:
        return -(-self.shape[0] // LANES)

    @property
    def padding_ratio(self) -> float:
        return self.vals.shape[0] * self.cr * LANES / max(self.nnz, 1)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        from polysolve_tpu.ops.spmv import use_pallas_dia as _on_tpu

        if _on_tpu():
            return tile_ell_matvec_pallas(self, x)
        return tile_ell_matvec_ref(self, x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "tile-ELL is a matvec-only hot format; use ELL for rmatvec")

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [self.matvec(X[:, j]) for j in range(X.shape[1])], axis=1)


# --------------------------------------------------------------------------- #
# Host packer                                                                 #
# --------------------------------------------------------------------------- #


def pack(A: sp.spmatrix, dtype=None, cr: int = CR_DEFAULT) -> TileELLMatrix:
    """Pack a CSR matrix (ideally RCM/band-limited ordered) into composite
    tile-ELL. Tries the native C++ packer first; numpy fallback."""
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    A.sort_indices()
    dtype = dtype or default_dtype()
    n, m = A.shape
    TR = -(-n // LANES)

    from polysolve_tpu import native

    packed = native.tile_ell_pack(A, cr=cr) if n >= 1 else None
    if packed is None:
        packed = _pack_numpy(A, TR, cr)
    vals, r8, q8, wb, tile_of = packed
    return TileELLMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        r8=jnp.asarray(r8),
        q8t=jnp.asarray(np.swapaxes(q8, 1, 2).copy()),
        wb=jnp.asarray(wb),
        tile_of=jnp.asarray(tile_of),
        shape=(n, m),
        nnz=int(A.nnz),
        cr=cr,
    )


def _pack_numpy(A: sp.csr_matrix, TR: int, cr: int = CR_DEFAULT):
    """First-fit composite packing, pure numpy + per-entry inner loop.
    The native packer (cpp/host_kernels.cpp tile_ell_pack) implements the
    same algorithm; this is the correctness anchor and small-n path."""
    CR = cr
    n, m = A.shape
    indptr, indices, data = A.indptr, A.indices, A.data

    out_v, out_r, out_q, out_wb, out_tile = [], [], [], [], []

    for t in range(TR):
        r0, r1 = t * LANES, min((t + 1) * LANES, n)
        lo, hi = indptr[r0], indptr[r1]
        if hi == lo:
            out_v.append(np.zeros((1, CR, LANES)))
            out_r.append(np.zeros((1, CR, LANES), np.int8))
            out_q.append(np.zeros((1, CR, LANES), np.int8))
            out_wb.append(np.zeros(1, np.int32))
            out_tile.append(np.full(1, t, np.int32))
            continue
        cols = indices[lo:hi]
        vals = data[lo:hi]
        lane = np.repeat(np.arange(r0, r1) - r0,
                         np.diff(indptr[r0:r1 + 1]))
        seg = cols // LANES
        rho = cols % LANES

        # window groups: sorted by segment; new group when span > GROUP_SPAN
        order = np.argsort(seg, kind="stable")
        segs_sorted = seg[order]
        gbase = segs_sorted[0] - (segs_sorted[0] % 8)
        group_id = np.zeros(len(order), np.int64)
        g = 0
        for i in range(1, len(order)):
            if segs_sorted[i] - gbase > GROUP_SPAN:
                g += 1
                gbase = segs_sorted[i] - (segs_sorted[i] % 8)
            group_id[i] = g

        for gi in range(group_id[-1] + 1):
            sel = order[group_id == gi]
            le, se, re_, ve = lane[sel], seg[sel], rho[sel], vals[sel]
            base = int(se.min())
            base -= base % 8
            sloc = (se - base).astype(np.int8)
            # first-fit with per-dest-lane monotone cursor
            qmaps = [np.full(LANES, -1, np.int64)]
            used = [np.zeros(LANES, bool)]
            V = [np.zeros(LANES)]
            R = [np.zeros(LANES, np.int8)]
            cursor = np.zeros(LANES, np.int64)
            for e in range(len(sel)):
                l, s_, r_, v_ = le[e], sloc[e], re_[e], ve[e]
                j = cursor[l]
                while True:
                    if j >= len(qmaps):
                        qmaps.append(np.full(LANES, -1, np.int64))
                        used.append(np.zeros(LANES, bool))
                        V.append(np.zeros(LANES))
                        R.append(np.zeros(LANES, np.int8))
                    if (not used[j][l]) and qmaps[j][r_] in (-1, s_):
                        used[j][l] = True
                        qmaps[j][r_] = s_
                        V[j][l] = v_
                        R[j][l] = r_
                        cursor[l] = j
                        break
                    j += 1
            nsl = len(qmaps)
            nch = -(-nsl // CR)
            Vc = np.zeros((nch, CR, LANES))
            Rc = np.zeros((nch, CR, LANES), np.int8)
            Qc = np.zeros((nch, CR, LANES), np.int8)
            for j in range(nsl):
                qm = qmaps[j]
                qm = np.where(qm < 0, 0, qm)
                Vc[j // CR, j % CR] = V[j]
                Rc[j // CR, j % CR] = R[j]
                Qc[j // CR, j % CR] = qm.astype(np.int8)
            out_v.append(Vc)
            out_r.append(Rc)
            out_q.append(Qc)
            out_wb.append(np.full(nch, base, np.int32))
            out_tile.append(np.full(nch, t, np.int32))

    return (np.concatenate(out_v), np.concatenate(out_r),
            np.concatenate(out_q), np.concatenate(out_wb),
            np.concatenate(out_tile))


# --------------------------------------------------------------------------- #
# Reference (pure-jnp) SpMV — correctness anchor + CPU path                   #
# --------------------------------------------------------------------------- #


def _pad_x2d(A: TileELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    m = A.shape[1]
    S = -(-m // LANES)
    xp = jnp.pad(x, (0, S * LANES - m + WIN * LANES))
    return xp.reshape(-1, LANES)


def tile_ell_matvec_ref(A: TileELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    x2d = _pad_x2d(A, x)
    q = jnp.swapaxes(A.q8t.astype(jnp.int32), 1, 2)         # (TC, cr, 128)
    seg_abs = A.wb[:, None, None] + q
    rho = jax.lax.broadcasted_iota(jnp.int32, seg_abs.shape, 2)
    comp = x2d[seg_abs, rho]                                # composite rows
    g = jnp.take_along_axis(comp, A.r8.astype(jnp.int32), axis=2)
    contrib = jnp.sum(A.vals * g, axis=1)                   # (TC, 128)
    y2d = jax.ops.segment_sum(contrib, A.tile_of,
                              num_segments=A.n_tiles)
    return y2d.reshape(-1)[: A.shape[0]]


# --------------------------------------------------------------------------- #
# Pallas SpMV kernel                                                          #
# --------------------------------------------------------------------------- #


def tile_ell_matvec_pallas(A: TileELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    x2d = _pad_x2d(A, x)
    return _tile_ell_pallas(A.vals, A.r8, A.q8t, A.wb, A.tile_of,
                            x2d, A.n_tiles, A.cr)[: A.shape[0]]


@functools.partial(jax.jit, static_argnames=("n_tiles", "CR", "stream_only"))
def _tile_ell_pallas(vals, r8, q8t, wb, tile_of, x2d, n_tiles, CR,
                     stream_only: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TC = vals.shape[0]
    dtype = vals.dtype

    def kernel(tile_s, wb_s, q_ref, vals_ref, r_ref, x_hbm,
               y_ref, xwt, sem):
        c = pl.program_id(0)
        prev = jnp.maximum(c - 1, 0)
        new_tile = (c == 0) | (tile_s[c] != tile_s[prev])
        new_win = (c == 0) | (wb_s[c] != wb_s[prev])

        @pl.when(new_win)
        def _():
            # fetch the 128-row x window and transpose it once — the
            # composite-row select below is a lane gather on Xᵀ
            def scoped(xtmp, wsem):
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(wb_s[c], WIN), :], xtmp, wsem)
                cp.start()
                cp.wait()
                xwt[...] = xtmp[...].T
            pl.run_scoped(scoped, pltpu.VMEM((WIN, LANES), dtype),
                          pltpu.SemaphoreType.DMA)

        @pl.when(new_tile)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        if stream_only:
            # perf diagnostic: stream the slot data, skip the gathers —
            # isolates the grid/DMA floor from gather/transpose compute
            p = vals_ref[0] + r_ref[0].astype(dtype)
        else:
            qt = q_ref[0].astype(jnp.int32)                 # (128, CR)
            if CR < LANES:
                qpad = jnp.concatenate(
                    [qt, jnp.zeros((LANES, LANES - CR), jnp.int32)], axis=1)
            else:
                qpad = qt
            G = jnp.take_along_axis(xwt[...], qpad, axis=1)  # (128, 128)
            comp = G.T[:CR]                                  # (CR, 128)
            g = jnp.take_along_axis(comp, r_ref[0].astype(jnp.int32), axis=1)
            p = vals_ref[0] * g
        # partial sums in 8 sublanes (a (1,128) output block is not a legal
        # TPU tile); the final sublane reduction happens outside the kernel
        y_ref[...] += p.reshape(1, CR // 8, 8, LANES).sum(axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_of, wb
        grid=(TC,),
        in_specs=[
            pl.BlockSpec((1, LANES, CR), lambda c, ts, wbs: (c, 0, 0)),
            pl.BlockSpec((1, CR, LANES), lambda c, ts, wbs: (c, 0, 0)),
            pl.BlockSpec((1, CR, LANES), lambda c, ts, wbs: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda c, ts, wbs: (ts[c], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((LANES, WIN), dtype),   # transposed x window
            pltpu.SemaphoreType.DMA,
        ],
    )
    y3d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, LANES), dtype),
    )(tile_of, wb, q8t, vals, r8, x2d)
    return y3d.sum(axis=1).reshape(-1)
