"""Tile-ELL: the TPU-native unstructured-sparse format + SpMV kernel.

This is the general-matrix hot kernel — the role of cuSPARSE CSR SpMV in the
reference's MAS PCG loop (reference CuSparseWrapper.hpp:13-60,
MASSolver.cu:469-595) — for matrices with no exploitable diagonal structure
(DIA covers stencils; this covers everything else).

Design (probed + measured on TPU v5e, experiments/gather_probe*.py and
experiments/tile_ell_sweep.py):

Mosaic lowers ``jnp.take_along_axis`` only for equal-shape src/idx; the lane
crossbar (axis=1) is fast, the multi-vreg sublane gather (axis=0) crashes
this toolchain (emulated via transposes). The format is built around that:

- rows map to **lanes**: row ``i`` is lane ``i % 128`` of dest tile
  ``i // 128``; ST consecutive dest tiles form a **supertile**;
- ``x`` is viewed as ``x2d = x.reshape(S, 128)``; a column index ``c``
  splits into (segment ``c // 128``, source lane ``c % 128``);
- a **composite slot-row** holds ≤128 nnz of ONE dest tile (one per dest
  lane) plus a per-source-lane segment map ``q[ρ]``: the slot at lane ``l``
  may fetch x entry ``(q[ρ], ρ)`` for any ``ρ`` — two entries conflict only
  if they need different segments from the same source lane;
- slot-rows are built against ROLLING 8-aligned windows (v3 packer): each
  carries an absolute segment map spanning ≤120 segments from its own
  aligned min; chunks of CR=128 slot-rows are cut in creation order, and
  ``bs`` consecutive chunks form a **superchunk** sharing one 128-row x
  window — one window fetch + transpose and one grid step serve bs·CR·128
  slots. (The earlier fixed-segment-group packer paid 2-4× CR tail
  rounding at CR=128 and a 0.24 µs grid-step floor per small chunk.)

SpMV per chunk (bs per grid step):
  ``G    = take_along_axis(Xᵀ, qᵀ, 1)``           (lane gather, (128,128))
  ``comp = Gᵀ[:CR]``                              (composite rows)
  ``g    = take_along_axis(comp, r, 1)``          (lane crossbar)
  ``p    = vals · g``                             (fma)
  ``y_super += [OH₀|…|OH_bs] @ [p₀;…;p_bs]``      (MXU: dest-tile reduce)
where ``Xᵀ`` is transposed once per superchunk and ``OH`` is the host-built
(ST, CR) one-hot of each slot-row's dest tile. ``vals`` (f32) and ``q``/
``r``/``OH`` (int8) stream through the Pallas grid pipeline — ~6.2 HBM
bytes per slot, measured 2.9× slot padding and 11.1 Gnnz/s on a 1M-row
unstructured 3-D elasticity matrix (experiments/tile_ell_tpu_results.jsonl;
the round-1 XLA-gather path managed 0.13).

The first-fit packer (numpy here, native C++ fast path
``tile_ell_plan3/fetch3`` in cpp/host_kernels.cpp) uses a per-(dest-tile,
lane) monotone cursor + per-dest-tile open-slot pruning: placement is
amortized O(1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from flax import struct

from polysolve_tpu.types import default_dtype


LANES = 128
CR_DEFAULT = 128  # slot-rows per chunk
ST_DEFAULT = 120  # dest tiles per supertile — larger supertiles let the
                  # first-fit packer fill slots denser: padding 2.9 (st=32)
                  # → 2.3 (st=120) and 11.55 → 14.11 Gnnz/s measured on the
                  # 1M-row elasticity fixture (round3_tpu_results.jsonl)
BS_DEFAULT = 2    # chunks per superchunk/grid step (measured best; 4 loses
                  # more to window-break padding than it saves in overhead)
WIN = 128         # x2d rows per chunk window
GROUP_SPAN = 120  # max segment span of a slot-row (8-align slack)


@struct.dataclass
class TileELLMatrix:
    """Chunked supertile composite tile-ELL device matrix (module docstring).

    Fields (TC = total chunk count)
    -----
    vals    : (TC, CR, 128) float — slot values (0 = padding)
    r8      : (TC, CR, 128) int8  — source lane of each slot's column
    q8t     : (TC, 128, CR) int8  — per-(source-lane, slot-row) segment,
                                     relative to the chunk window base
                                     (TRANSPOSED: fed to the lane gather on Xᵀ)
    dt8     : (TC, 8, CR)   int8  — dest tile of each slot-row, replicated
                                     over 8 sublanes (Mosaic block shapes
                                     need sublane divisibility; the kernel
                                     expands the one-hot reduction operand
                                     with an iota compare; streaming the
                                     (ST, CR) one-hot cost 0.94 B/slot —
                                     ~13%% of the stream traffic — vs
                                     0.06 B/slot for this plane)
    wb      : (TC,)         int32 — chunk window base row of x2d (8-aligned)
    super_of: (TC,)         int32 — owning supertile (sorted)
    shape   : static (n, m) of the original matrix
    nnz     : static true nnz
    cr, st  : static chunk geometry
    """

    vals: jnp.ndarray
    r8: jnp.ndarray
    q8t: jnp.ndarray
    dt8: jnp.ndarray
    wb: jnp.ndarray
    super_of: jnp.ndarray
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    cr: int = struct.field(pytree_node=False, default=CR_DEFAULT)
    st: int = struct.field(pytree_node=False, default=ST_DEFAULT)
    bs: int = struct.field(pytree_node=False, default=1)
    # single-pass bf16 dest reduce (1.4e-3/matvec) instead of the two-pass
    # split (2.6e-6): set for PRECONDITIONER-INTERNAL operators (AMG
    # smoother/transfer matvecs are O(1e-1) approximations by design) —
    # solver-level operators keep the accurate reduce
    fast_reduce: bool = struct.field(pytree_node=False, default=False)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_super(self) -> int:
        return -(-self.shape[0] // (self.st * LANES))

    @property
    def padding_ratio(self) -> float:
        return self.vals.shape[0] * self.cr * LANES / max(self.nnz, 1)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        from polysolve_tpu.ops.spmv import use_pallas_dia as _on_tpu

        if _on_tpu():
            return tile_ell_matvec_pallas(self, x)
        return tile_ell_matvec_ref(self, x)

    def with_fast_reduce(self) -> "TileELLMatrix":
        return self.replace(fast_reduce=True)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "tile-ELL is a matvec-only hot format; use ELL for rmatvec")

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack(
            [self.matvec(X[:, j]) for j in range(X.shape[1])], axis=1)


# --------------------------------------------------------------------------- #
# Host packer                                                                 #
# --------------------------------------------------------------------------- #


def pack(A: sp.spmatrix, dtype=None, cr: int = CR_DEFAULT,
         st: int = ST_DEFAULT, bs: int = BS_DEFAULT) -> TileELLMatrix:
    """Pack a CSR matrix (ideally RCM/band-limited ordered) into supertile
    composite tile-ELL. Tries the native C++ packer first; numpy fallback.
    ``bs`` chunks form a superchunk sharing one x window — the kernel
    processes a whole superchunk per grid step (amortizes the grid-step
    floor, the window DMA and the window transpose)."""
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    A.sort_indices()
    dtype = dtype or default_dtype()
    n, m = A.shape
    # dt8 is an int8 dest-tile plane: st >= 128 would wrap indices negative
    # and the kernel's iota compare silently drops those contributions
    # (ADVICE r4 low #2 — fail loudly on out-of-range sweep configs)
    if st > 127:
        raise ValueError(f"tile_ell.pack: st={st} exceeds the int8 "
                         "dest-tile plane range (max 127)")

    from polysolve_tpu import native

    # v3 rolling-window packer: slot-rows span their own 8-aligned windows,
    # chunks cut at CR (no per-group CR tail rounding — v2 paid 2-4x at
    # CR=128; a second segment map was measured to recover <1%, so nqm=1)
    packed = native.tile_ell_pack3(A, cr=cr, st=st, bs=bs)
    if packed is not None:
        vals, r8, q8, oh8, wb, super_of = packed
    else:
        vals, r8, q8, oh8, wb, super_of = _pack_numpy(A, cr, st, bs=bs)
    # one-hot → index plane (empty slot-rows argmax to tile 0: their vals
    # are all zero, so the reduction contribution is zero either way)
    dt8 = np.ascontiguousarray(np.repeat(
        np.argmax(np.asarray(oh8), axis=1).astype(np.int8)[:, None, :],
        8, axis=1))
    return TileELLMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        r8=jnp.asarray(r8),
        q8t=jnp.asarray(np.swapaxes(q8, 1, 2).copy()),
        dt8=jnp.asarray(dt8),
        wb=jnp.asarray(wb),
        super_of=jnp.asarray(super_of),
        shape=(n, m),
        nnz=int(A.nnz),
        cr=cr,
        st=st,
        bs=bs,
    )


def pack_with_plan(A: sp.spmatrix, dtype=None, cr: int = CR_DEFAULT,
                   st: int = ST_DEFAULT, bs: int = BS_DEFAULT):
    """Like :func:`pack`, but also returns the VALUE-SCATTER PLAN: an int64
    (TC, CR, 128) array mapping each slot to its source index in the
    (canonical, duplicate-summed) CSR ``data`` array, −1 for padding slots.
    Placement is pattern-only (native ``tile_ell_plan3`` never sees values),
    so a Newton-loop refactorize with an unchanged sparsity pattern rebuilds
    ``vals`` in O(nnz) via :func:`repack_values` instead of re-running the
    packer — the facade-overhead fix (reference economics: AMGCL rebuilds
    fully per factorize, AMGCL.cpp:148-184)."""
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    A.sort_indices()
    dtype = dtype or default_dtype()
    if st > 127:
        raise ValueError(f"tile_ell.pack_with_plan: st={st} exceeds int8")
    # pack with data = 1..nnz (exact in float64 below 2^53): the returned
    # vals ARE the 1-based source indices; 0 = padding
    A_idx = sp.csr_matrix(
        (np.arange(1, A.nnz + 1, dtype=np.float64), A.indices, A.indptr),
        shape=A.shape)

    from polysolve_tpu import native

    packed = native.tile_ell_pack3(A_idx, cr=cr, st=st, bs=bs)
    if packed is None:
        packed = _pack_numpy(A_idx, cr, st, bs=bs)
    idx_vals, r8, q8, oh8, wb, super_of = packed
    plan = np.asarray(idx_vals, np.int64) - 1          # -1 = padding
    vals = np.where(plan >= 0, A.data[np.maximum(plan, 0)], 0.0)
    dt8 = np.ascontiguousarray(np.repeat(
        np.argmax(np.asarray(oh8), axis=1).astype(np.int8)[:, None, :],
        8, axis=1))
    M = TileELLMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        r8=jnp.asarray(r8),
        q8t=jnp.asarray(np.swapaxes(q8, 1, 2).copy()),
        dt8=jnp.asarray(dt8),
        wb=jnp.asarray(wb),
        super_of=jnp.asarray(super_of),
        shape=A.shape, nnz=int(A.nnz), cr=cr, st=st, bs=bs)
    return M, plan


def repack_values(M: TileELLMatrix, plan: np.ndarray,
                  data: np.ndarray) -> TileELLMatrix:
    """O(nnz) value-only refill of a packed matrix: ``data`` is the new CSR
    data array (same canonical pattern the plan was built from)."""
    vals = np.where(plan >= 0, np.asarray(data)[np.maximum(plan, 0)], 0.0)
    return M.replace(vals=jnp.asarray(vals, dtype=M.dtype))


def _pack_numpy(A: sp.csr_matrix, cr: int, st: int,
                span_cap: int = GROUP_SPAN, bs: int = 1):
    """Rolling-window first-fit supertile packing (v3), numpy + per-entry
    inner loop — the correctness anchor for the native ``tile_ell_plan3``
    (same algorithm): slot-rows hold ABSOLUTE segment maps bounded to
    ``span_cap`` from their own 8-aligned min; chunks cut at CR slot-rows
    or when a slot-row's max segment leaves the chunk base's 127-window."""
    n, m = A.shape
    indptr, indices, data = A.indptr, A.indices, A.data
    rows_per = st * LANES
    NS = -(-n // rows_per)

    out = {k: [] for k in ("v", "r", "q", "oh", "wb", "sup")}

    for S in range(NS):
        r0, r1 = S * rows_per, min((S + 1) * rows_per, n)
        lo, hi = indptr[r0], indptr[r1]
        if hi == lo:
            out["v"].append(np.zeros((bs, cr, LANES)))
            out["r"].append(np.zeros((bs, cr, LANES), np.int8))
            out["q"].append(np.zeros((bs, cr, LANES), np.int8))
            out["oh"].append(np.zeros((bs, st, cr), np.int8))
            out["wb"].append(np.zeros(bs, np.int32))
            out["sup"].append(np.full(bs, S, np.int32))
            continue
        cols = indices[lo:hi]
        vals = data[lo:hi]
        rows = np.repeat(np.arange(r0, r1), np.diff(indptr[r0:r1 + 1]))
        lane = (rows % LANES).astype(np.int64)
        dt = ((rows - r0) // LANES).astype(np.int64)
        seg = (cols // LANES).astype(np.int64)
        rho = (cols % LANES).astype(np.int64)

        order = np.argsort(seg, kind="stable")
        # phase A: rolling-window slot-row construction (absolute qmaps)
        qmaps, used, sdt, smin, smax, V, R = [], [], [], [], [], [], []
        per_dt = [[] for _ in range(st)]
        open_lo = np.zeros(st, np.int64)
        cursor = np.zeros((st, LANES), np.int64)
        for e in order:
            l, d_, s_, r_, v_ = lane[e], dt[e], int(seg[e]), rho[e], vals[e]
            vec = per_dt[d_]
            while open_lo[d_] < len(vec) and \
                    s_ > (smin[vec[open_lo[d_]]]
                          - smin[vec[open_lo[d_]]] % 8 + span_cap):
                open_lo[d_] += 1
            k = max(cursor[d_, l], open_lo[d_])
            while True:
                if k == len(vec):
                    sid = len(sdt)
                    vec.append(sid)
                    sdt.append(d_)
                    smin.append(s_)
                    smax.append(s_)
                    qmaps.append(np.full(LANES, -1, np.int64))
                    used.append(np.zeros(LANES, bool))
                    V.append(np.zeros(LANES))
                    R.append(np.zeros(LANES, np.int8))
                else:
                    sid = vec[k]
                    if s_ > smin[sid] - smin[sid] % 8 + span_cap or \
                            used[sid][l] or qmaps[sid][r_] not in (-1, s_):
                        k += 1
                        continue
                used[sid][l] = True
                qmaps[sid][r_] = s_
                smax[sid] = max(smax[sid], s_)
                V[sid][l] += v_
                R[sid][l] = r_
                cursor[d_, l] = k
                break
        # phase B: chunk cut in creation order (smin nondecreasing); bs
        # consecutive chunks form a superchunk sharing one window base
        nsl = len(sdt)
        s_chunk = np.zeros(nsl, np.int64)
        s_srow = np.zeros(nsl, np.int64)
        wbs = []
        count, base = cr, 0
        chunk_in_sc, have_sc = bs, False
        for sid in range(nsl):
            window_break = have_sc and smax[sid] - base > 127
            if count == cr or window_break:
                if not have_sc or window_break or chunk_in_sc == bs:
                    while have_sc and chunk_in_sc < bs:  # pad superchunk
                        wbs.append(base)
                        chunk_in_sc += 1
                    base = smin[sid] - smin[sid] % 8
                    chunk_in_sc = 0
                    have_sc = True
                wbs.append(base)
                chunk_in_sc += 1
                count = 0
            s_chunk[sid] = len(wbs) - 1
            s_srow[sid] = count
            count += 1
        while have_sc and chunk_in_sc < bs:
            wbs.append(base)
            chunk_in_sc += 1
        nch = len(wbs)
        Vc = np.zeros((nch, cr, LANES))
        Rc = np.zeros((nch, cr, LANES), np.int8)
        Qc = np.zeros((nch, cr, LANES), np.int8)
        Oc = np.zeros((nch, st, cr), np.int8)
        for sid in range(nsl):
            c, sr = s_chunk[sid], s_srow[sid]
            qm = np.where(qmaps[sid] < 0, 0, qmaps[sid] - wbs[c])
            Vc[c, sr] = V[sid]
            Rc[c, sr] = R[sid]
            Qc[c, sr] = qm.astype(np.int8)
            Oc[c, sdt[sid], sr] = 1
        out["v"].append(Vc)
        out["r"].append(Rc)
        out["q"].append(Qc)
        out["oh"].append(Oc)
        out["wb"].append(np.asarray(wbs, np.int32))
        out["sup"].append(np.full(nch, S, np.int32))

    return (np.concatenate(out["v"]), np.concatenate(out["r"]),
            np.concatenate(out["q"]), np.concatenate(out["oh"]),
            np.concatenate(out["wb"]), np.concatenate(out["sup"]))


# --------------------------------------------------------------------------- #
# Block tile-ELL: b×b dense blocks on the condensed node graph               #
# --------------------------------------------------------------------------- #


@struct.dataclass
class TileELLBlockMatrix:
    """Block-compressed tile-ELL for FEM systems with b dofs per node (the
    TPU answer to the reference's BSR formats — MASSolver.cu:198 block_dim,
    AMGCL's block_value_type<3>, AMGCL.hpp:48-98).

    Packing runs the SCALAR v3 planner on the condensed node graph (one
    slot per b×b block); each slot streams b² values but only ONE (r8, q8)
    index pair — 0.22 B/nnz of index traffic at b=3 vs 2 B/nnz scalar, and
    one gather/transpose pipeline pass serves b² nnz instead of 1. Node
    spans are b× smaller in segments, so the 128-segment window covers the
    RCM band that forces the scalar packer to split slot-rows (measured
    1M-row elasticity: scalar padding 2.05 window-span-bound vs ~1.5 on
    the node graph).

    Vectors live in PLANAR-TILE layout: dof (node I, comp c) sits at flat
    index (I//128)·b·128 + c·128 + (I%128) — i.e. x2d is (S, b·128) with
    component-contiguous 128-lane groups. The facade folds this into its
    solve-boundary permutation (``planar_perm``); matvec consumes and
    produces planar vectors with NO device relayout.

    vals : (TC, b², CR, 128) — slot values, block element o = li·b + lj
    r8/q8t/dt8/wb/super_of : identical to the scalar format, node-indexed
    """

    vals: jnp.ndarray
    r8: jnp.ndarray
    q8t: jnp.ndarray
    dt8: jnp.ndarray
    wb: jnp.ndarray
    super_of: jnp.ndarray
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    bdim: int = struct.field(pytree_node=False, default=3)
    nnzb: int = struct.field(pytree_node=False, default=0)
    cr: int = struct.field(pytree_node=False, default=CR_DEFAULT)
    st: int = struct.field(pytree_node=False, default=ST_DEFAULT)
    bs: int = struct.field(pytree_node=False, default=1)
    fast_reduce: bool = struct.field(pytree_node=False, default=False)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nb(self) -> int:
        return self.shape[0] // self.bdim

    @property
    def n_super(self) -> int:
        return -(-self.nb // (self.st * LANES))

    @property
    def padding_ratio(self) -> float:
        return self.vals.shape[0] * self.cr * LANES / max(self.nnzb, 1)

    def with_fast_reduce(self) -> "TileELLBlockMatrix":
        return self.replace(fast_reduce=True)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """PLANAR-layout matvec: x and y are planar-tile vectors (see class
        docstring), length planar_size(n, b). Callers own the boundary
        permutation."""
        from polysolve_tpu.ops.spmv import use_pallas_dia as _on_tpu

        npl = planar_size(self.shape[0], self.bdim)
        if _on_tpu():
            return tile_block_matvec_pallas(self, x)[: npl]
        return tile_block_matvec_ref(self, x)[: npl]

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError("block tile-ELL is matvec-only")


def planar_perm(n: int, bdim: int) -> np.ndarray:
    """perm such that x_planar = x[perm]: dof (I, c) → (I//128)·b·128 +
    c·128 + I%128, padded conceptually at the caller (perm covers the
    first n entries of the padded planar vector)."""
    nb = n // bdim
    I = np.arange(nb)
    # planar position of each (I, c)
    out = np.empty(n, dtype=np.int64)
    for c in range(bdim):
        pos = (I // LANES) * bdim * LANES + c * LANES + (I % LANES)
        out[pos] = I * bdim + c
    return out


def planar_size(n: int, bdim: int) -> int:
    nb = n // bdim
    return (-(-nb // LANES)) * bdim * LANES


def pack_block(A: sp.spmatrix, bdim: int, dtype=None, cr: int = CR_DEFAULT,
               st: int = ST_DEFAULT, bs: int = BS_DEFAULT):
    """Pack a b-block CSR matrix into block tile-ELL. Returns (M, plan,
    block_of, offs_of) where ``plan`` is the node-graph slot plan and
    (block_of, offs_of) map each scalar CSR entry to its (block index,
    b²-offset) — together they give O(nnz) value-only refactorize:
    ``repack_block_values``."""
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    A.sort_indices()
    dtype = dtype or default_dtype()
    n, m = A.shape
    assert n % bdim == 0 and m % bdim == 0, (n, m, bdim)
    nb = n // bdim
    C = A.tocoo()
    BI = (C.row // bdim).astype(np.int64)
    BJ = (C.col // bdim).astype(np.int64)
    off = (C.row % bdim) * bdim + (C.col % bdim)
    An = sp.csr_matrix((np.ones(len(BI), np.float64), (BI, BJ)),
                       shape=(nb, nb))
    An.sum_duplicates()
    Anc = An.tocoo()  # canonical sorted keys
    keys = Anc.row.astype(np.int64) * nb + Anc.col
    block_of = np.searchsorted(keys, BI * nb + BJ)
    nnzb = An.nnz
    block_vals = np.zeros((nnzb, bdim * bdim))
    block_vals[block_of, off] = C.data
    # plan-pack the node pattern (placement is pattern-only)
    An_idx = sp.csr_matrix(
        (np.arange(1, nnzb + 1, dtype=np.float64), An.indices, An.indptr),
        shape=(nb, nb))

    from polysolve_tpu import native

    packed = native.tile_ell_pack3(An_idx, cr=cr, st=st, bs=bs)
    if packed is None:
        packed = _pack_numpy(An_idx, cr, st, bs=bs)
    idx_vals, r8, q8, oh8, wb, super_of = packed
    plan = np.asarray(idx_vals, np.int64) - 1            # (TC, CR, 128)
    vals = np.where(plan[..., None] >= 0,
                    block_vals[np.maximum(plan, 0)], 0.0)
    vals = np.moveaxis(vals, -1, 1)                      # (TC, b², CR, 128)
    dt8 = np.ascontiguousarray(np.repeat(
        np.argmax(np.asarray(oh8), axis=1).astype(np.int8)[:, None, :],
        8, axis=1))
    M = TileELLBlockMatrix(
        vals=jnp.asarray(np.ascontiguousarray(vals), dtype=dtype),
        r8=jnp.asarray(r8),
        q8t=jnp.asarray(np.swapaxes(q8, 1, 2).copy()),
        dt8=jnp.asarray(dt8),
        wb=jnp.asarray(wb),
        super_of=jnp.asarray(super_of),
        shape=(n, m), nnz=int(A.nnz), bdim=bdim, nnzb=int(nnzb),
        cr=cr, st=st, bs=bs)
    return M, plan, block_of, off


def repack_block_values(M: TileELLBlockMatrix, plan: np.ndarray,
                        block_of: np.ndarray, offs: np.ndarray,
                        data: np.ndarray) -> TileELLBlockMatrix:
    """O(nnz) value refill for an unchanged pattern."""
    b2 = M.bdim * M.bdim
    block_vals = np.zeros((M.nnzb, b2))
    block_vals[block_of, offs] = np.asarray(data)
    vals = np.where(plan[..., None] >= 0,
                    block_vals[np.maximum(plan, 0)], 0.0)
    vals = np.ascontiguousarray(np.moveaxis(vals, -1, 1))
    return M.replace(vals=jnp.asarray(vals, dtype=M.dtype))


def _pad_x2d_block(M: TileELLBlockMatrix, x_planar: jnp.ndarray):
    """Pad a planar vector to the kernel's (S_pad, b·128) window shape."""
    b = M.bdim
    S = planar_size(M.shape[1], b) // (b * LANES)
    xp = jnp.pad(x_planar.reshape(-1),
                 (0, (S + WIN) * b * LANES - x_planar.size))
    return xp.reshape(-1, b * LANES)


def to_planar(x: np.ndarray, bdim: int) -> np.ndarray:
    """Host-side dof→planar conversion (numpy; the facade folds this into
    its boundary permutation instead)."""
    n = x.shape[0]
    nb = n // bdim
    x3 = np.asarray(x).reshape(nb, bdim)
    nbp = -(-nb // LANES)
    xp = np.zeros((nbp * LANES, bdim), dtype=x3.dtype)
    xp[:nb] = x3
    return np.ascontiguousarray(
        xp.reshape(nbp, LANES, bdim).transpose(0, 2, 1)).reshape(-1)


def from_planar(y: np.ndarray, n: int, bdim: int) -> np.ndarray:
    """Planar→dof conversion; accepts supertile-padded vectors (truncates
    past the used node tiles)."""
    nb = n // bdim
    nbp = -(-nb // LANES)
    y3 = np.asarray(y).reshape(-1, bdim, LANES)[:nbp].transpose(0, 2, 1)
    return np.ascontiguousarray(y3).reshape(-1, bdim).reshape(-1)[: n]


def tile_block_matvec_ref(M: TileELLBlockMatrix,
                          x_planar: jnp.ndarray) -> jnp.ndarray:
    """jnp reference (CPU path): planar in, planar out."""
    b = M.bdim
    x2d = _pad_x2d_block(M, x_planar)                    # (S+W, b·128)
    q = jnp.swapaxes(M.q8t.astype(jnp.int32), 1, 2)      # (TC, CR, 128)
    seg_abs = M.wb[:, None, None] + q
    rho = jax.lax.broadcasted_iota(jnp.int32, seg_abs.shape, 2)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (M.st, M.cr), 0)[None]
          == M.dt8[:, 0, :].astype(jnp.int32)[:, None, :]
          ).astype(M.vals.dtype)
    ys = []
    for c in range(b):
        acc = None
        for cp in range(b):
            comp = x2d[:, cp * LANES:(cp + 1) * LANES][seg_abs, rho]
            g = jnp.take_along_axis(comp, M.r8.astype(jnp.int32), axis=2)
            term = M.vals[:, c * b + cp] * g
            acc = term if acc is None else acc + term
        contrib = jnp.einsum("cts,csl->ctl", oh, acc)    # (TC, ST, 128)
        ys.append(jax.ops.segment_sum(contrib, M.super_of,
                                      num_segments=M.n_super))
    y = jnp.stack(ys, axis=2)                            # (NS, ST, b, 128)
    return y.reshape(-1)


def tile_block_matvec_pallas(M: TileELLBlockMatrix,
                             x_planar: jnp.ndarray) -> jnp.ndarray:
    x2d = _pad_x2d_block(M, x_planar)
    return _tile_block_pallas(M.vals, M.r8, M.q8t, M.dt8, M.wb, M.super_of,
                              x2d, M.n_super, M.cr, M.st, M.bs, M.bdim,
                              reduce_mode=("fast" if M.fast_reduce
                                           else "split2"))


@functools.partial(jax.jit,
                   static_argnames=("n_super", "CR", "ST", "BS", "BD",
                                    "reduce_mode"))
def _tile_block_pallas(vals, r8, q8t, dt8, wb, super_of, x2d, n_super,
                       CR, ST, BS: int, BD: int,
                       reduce_mode: str = "split2"):
    """Block kernel: one gather/transpose pipeline pass per COMPONENT per
    chunk serves b² nnz per slot; the dest reduce runs per output
    component on the shared one-hot. Output is (NS·ST, b·128) planar."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TC = vals.shape[0]
    dtype = vals.dtype
    assert TC % BS == 0, (TC, BS)
    wb_sc = wb[::BS]
    sup_sc = super_of[::BS]
    NSC = TC // BS

    def kernel(sup_s, wb_s, q_ref, dt_ref, vals_ref, r_ref, x_hbm,
               y_ref, xwt, sem):
        c = pl.program_id(0)
        prev = jnp.maximum(c - 1, 0)
        new_super = (c == 0) | (sup_s[c] != sup_s[prev])
        new_win = (c == 0) | (wb_s[c] != wb_s[prev])

        @pl.when(new_win)
        def _():
            def scoped(xtmp, wsem):
                # window bases are 8-aligned by the packer; (x//8)*8 makes
                # that PROVABLE to Mosaic (the 384-lane x_hbm DMA otherwise
                # fails "tile index in dimension 0 divisible by 8")
                wb_al = (wb_s[c] // jnp.int32(8)) * jnp.int32(8)
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(wb_al, WIN), :], xtmp, wsem)
                cp.start()
                cp.wait()
                for comp in range(BD):
                    # static sublane offsets (comp·128 ≡ 0 mod 8 — 2-D
                    # scratch: Mosaic could not prove leading-dim tiling
                    # for a (BD, 128, WIN) indexed store)
                    xwt[comp * LANES:(comp + 1) * LANES, :] = \
                        xtmp[:, comp * LANES:(comp + 1) * LANES].T
            pl.run_scoped(scoped, pltpu.VMEM((WIN, BD * LANES), dtype),
                          pltpu.SemaphoreType.DMA)

        @pl.when(new_super)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        # per-chunk gather pipeline, once per INPUT component
        gs = []          # gs[b][cp] = (CR, 128) gathered x values
        for bi in range(BS):
            qt = q_ref[bi].astype(jnp.int32)             # (128, CR)
            if CR < LANES:
                qpad = jnp.concatenate(
                    [qt, jnp.zeros((LANES, LANES - CR), jnp.int32)], axis=1)
            else:
                qpad = qt
            r_idx = r_ref[bi].astype(jnp.int32)
            per_cp = []
            for comp in range(BD):
                G = jnp.take_along_axis(
                    xwt[comp * LANES:(comp + 1) * LANES, :], qpad, axis=1)
                compT = G.T[:CR]
                per_cp.append(jnp.take_along_axis(compT, r_idx, axis=1))
            gs.append(per_cp)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (ST, CR), 0)
        ohs = [(iota_t == dt_ref[bi, 0].astype(jnp.int32)[None, :]
                ).astype(dtype) for bi in range(BS)]
        ohc = ohs[0] if BS == 1 else jnp.concatenate(ohs, axis=1)
        for comp_out in range(BD):
            ps = []
            for bi in range(BS):
                acc = None
                for cp in range(BD):
                    term = vals_ref[bi, comp_out * BD + cp] * gs[bi][cp]
                    acc = term if acc is None else acc + term
                ps.append(acc)
            p = ps[0] if BS == 1 else jnp.concatenate(ps, axis=0)
            sl = slice(comp_out * LANES, (comp_out + 1) * LANES)
            if reduce_mode == "fast":
                y_ref[:, sl] += jnp.dot(ohc, p, preferred_element_type=dtype)
            else:
                pb = p.astype(jnp.bfloat16).astype(dtype)
                plo = p - pb
                y_ref[:, sl] += (
                    jnp.dot(ohc, pb, preferred_element_type=dtype)
                    + jnp.dot(ohc, plo, preferred_element_type=dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NSC,),
        in_specs=[
            pl.BlockSpec((BS, LANES, CR), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec((BS, 8, CR), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec((BS, BD * BD, CR, LANES),
                         lambda c, ss, wbs: (c, 0, 0, 0)),
            pl.BlockSpec((BS, CR, LANES), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ST, BD * LANES),
                               lambda c, ss, wbs: (ss[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((BD * LANES, WIN), dtype),  # transposed windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * ST, BD * LANES), dtype),
    )(sup_sc, wb_sc, q8t, dt8, vals, r8, x2d)
    return y.reshape(-1)


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
    q = jnp.swapaxes(A.q8t.astype(jnp.int32), 1, 2)         # (TC, CR, 128)
    seg_abs = A.wb[:, None, None] + q
    rho = jax.lax.broadcasted_iota(jnp.int32, seg_abs.shape, 2)
    comp = x2d[seg_abs, rho]                                # composite rows
    g = jnp.take_along_axis(comp, A.r8.astype(jnp.int32), axis=2)
    p = A.vals * g                                          # (TC, CR, 128)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (A.st, A.cr), 0)[None]
          == A.dt8[:, 0, :].astype(jnp.int32)[:, None, :]
          ).astype(A.vals.dtype)
    contrib = jnp.einsum("cts,csl->ctl", oh, p)             # (TC, ST, 128)
    y = jax.ops.segment_sum(contrib, A.super_of,
                            num_segments=A.n_super)         # (NS, ST, 128)
    return y.reshape(-1)[: A.shape[0]]


# --------------------------------------------------------------------------- #
# Pallas SpMV kernel                                                          #
# --------------------------------------------------------------------------- #


def tile_ell_matvec_pallas(A: TileELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    x2d = _pad_x2d(A, x)
    return _tile_ell_pallas(A.vals, A.r8, A.q8t, A.dt8, A.wb, A.super_of,
                            x2d, A.n_super, A.cr, A.st, A.bs,
                            reduce_mode=("fast" if A.fast_reduce
                                         else "split2"))[: A.shape[0]]


@functools.partial(jax.jit,
                   static_argnames=("n_super", "CR", "ST", "BS",
                                    "stream_only", "window_mode", "diag",
                                    "transpose_mode", "reduce_mode"))
def _tile_ell_pallas(vals, r8, q8t, dt8, wb, super_of, x2d, n_super, CR, ST,
                     BS: int = 1, stream_only: bool = False,
                     window_mode: str = "inline", diag: str = "full",
                     transpose_mode: str = "vpu",
                     reduce_mode: str = "split2"):
    """window_mode: "inline" waits for each superchunk's x-window DMA on
    the critical path; "dbuf" double-buffers it (start window c+1 before
    computing superchunk c). MEASURED EQUAL on the TPU (11.47 vs 11.55
    Gnnz/s at st=32/bs=2, round3_tpu_results.jsonl) — the window fetch is
    already amortized across the superchunk, so inline stays the default.

    ``diag`` perf-diagnostic variants (results are WRONG except "full"):
    "stream" = stream slot data only; "nogather" = skip the two lane
    gathers, keep the one-hot MXU reduce; "nomxu" = keep gathers, replace
    the reduce with an elementwise add — isolates which pipeline stage
    costs the measured full-vs-stream gap."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TC = vals.shape[0]
    dtype = vals.dtype
    assert TC % BS == 0, (TC, BS)
    if stream_only:
        diag = "stream"
    stream_only = diag == "stream"
    # per-superchunk scalar maps (wb constant within a superchunk)
    wb_sc = wb[::BS]
    sup_sc = super_of[::BS]
    NSC = TC // BS
    dbuf = (window_mode == "dbuf") and not stream_only

    def kernel(sup_s, wb_s, q_ref, dt_ref, vals_ref, r_ref, x_hbm,
               y_ref, xwin, xwt, sem):
        c = pl.program_id(0)
        prev = jnp.maximum(c - 1, 0)
        new_super = (c == 0) | (sup_s[c] != sup_s[prev])
        new_win = (c == 0) | (wb_s[c] != wb_s[prev])

        def tr(M):
            """(128, 128) transpose — "mxu" routes it through a dot_general
            with the identity (out[i,j] = Σ_k M[k,i]·I[k,j]): the MXU pass
            measured ~30 ns/chunk vs the ~220 ns VPU gather/transpose
            pipeline (tdiag, round4_tpu_results.jsonl)."""
            if transpose_mode != "mxu":
                return M.T
            eye = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                   == jax.lax.broadcasted_iota(
                       jnp.int32, (LANES, LANES), 1)).astype(M.dtype)
            return jax.lax.dot_general(
                M, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=M.dtype)

        if dbuf:
            slot = jax.lax.rem(c, jnp.int32(2))
            nxt = jax.lax.rem(c + jnp.int32(1), jnp.int32(2))

            @pl.when(c == 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(wb_s[0], WIN), :], xwin.at[0],
                    sem.at[0]).start()

            @pl.when(c + 1 < NSC)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(wb_s[c + 1], WIN), :], xwin.at[nxt],
                    sem.at[nxt]).start()

            pltpu.make_async_copy(
                x_hbm.at[pl.ds(wb_s[c], WIN), :], xwin.at[slot],
                sem.at[slot]).wait()
            xwt[...] = tr(xwin[slot])
        elif not stream_only:
            @pl.when(new_win)
            def _():
                # fetch the 128-row x window and transpose it once PER
                # SUPERCHUNK — the composite-row select below is a lane
                # gather on Xᵀ
                def scoped(xtmp, wsem):
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(wb_s[c], WIN), :], xtmp, wsem)
                    cp.start()
                    cp.wait()
                    xwt[...] = tr(xtmp[...])
                pl.run_scoped(scoped, pltpu.VMEM((WIN, LANES), dtype),
                              pltpu.SemaphoreType.DMA)

        @pl.when(new_super)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        ps = []
        for b in range(BS):
            if diag in ("stream", "nogather"):
                # perf diagnostics: stream slot data, skip the gathers
                ps.append(vals_ref[b] + r_ref[b].astype(dtype))
                continue
            qt = q_ref[b].astype(jnp.int32)                 # (128, CR)
            if CR < LANES:
                qpad = jnp.concatenate(
                    [qt, jnp.zeros((LANES, LANES - CR), jnp.int32)], axis=1)
            else:
                qpad = qt
            G = jnp.take_along_axis(xwt[...], qpad, axis=1)  # (128, 128)
            comp = tr(G)[:CR]                                # (CR, 128)
            g = jnp.take_along_axis(
                comp, r_ref[b].astype(jnp.int32), axis=1)
            ps.append(vals_ref[b] * g)                       # (CR, 128)
        p = ps[0] if BS == 1 else jnp.concatenate(ps, axis=0)
        if diag == "stream":
            y_ref[...] += p[:ST]
            return
        if diag == "nomxu":
            # keep gathers, drop the MXU reduce (elementwise stand-in)
            for b in range(BS):
                y_ref[...] += ps[b][:ST]
            return
        # expand dest-tile indices to the one-hot reduction operand in
        # VMEM (iota compare — the (ST, CR) one-hot cost 0.94 B/slot of
        # HBM streaming when shipped precomputed)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (ST, CR), 0)
        ohs = [(iota_t == dt_ref[b, 0].astype(jnp.int32)[None, :]
                ).astype(dtype) for b in range(BS)]
        ohc = ohs[0] if BS == 1 else jnp.concatenate(ohs, axis=1)
        # two-pass bf16 split: the TPU default runs this fp32 dot as ONE
        # bf16 MXU pass, truncating p to 8 mantissa bits — measured 1.4e-3
        # relative error per matvec (round4 'tr' probe), which caps what
        # the fp32 Krylov loop can reach before df64 refinement takes
        # over. The one-hot operand is bf16-EXACT, so splitting only p
        # into (high, low) bf16 parts gives ~4e-6 accuracy for one extra
        # MXU pass — Precision.HIGHEST (which also splits the exact
        # one-hot) measured +115 ns/chunk and cost 14.1 → 11.4 Gnnz/s.
        if reduce_mode == "fast":
            # preconditioner-internal operators: one bf16 pass (1.4e-3)
            y_ref[...] += jnp.dot(ohc, p, preferred_element_type=dtype)
            return
        pb = p.astype(jnp.bfloat16).astype(dtype)
        plo = p - pb
        y_ref[...] += (jnp.dot(ohc, pb, preferred_element_type=dtype)
                       + jnp.dot(ohc, plo, preferred_element_type=dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # super_of, wb (per superchunk)
        grid=(NSC,),
        in_specs=[
            pl.BlockSpec((BS, LANES, CR), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec((BS, 8, CR), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec((BS, CR, LANES), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec((BS, CR, LANES), lambda c, ss, wbs: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # 2-D output blocks: supertile y = rows [ss·ST, (ss+1)·ST) of an
        # (NS·ST, 128) array (3-D revisited output blocks stalled Mosaic)
        out_specs=pl.BlockSpec((ST, LANES), lambda c, ss, wbs: (ss[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((2 if dbuf else 1, WIN, LANES), dtype),  # raw window
            pltpu.VMEM((LANES, WIN), dtype),   # transposed x window
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * ST, LANES), dtype),
    )(sup_sc, wb_sc, q8t, dt8, vals, r8, x2d)
    return y.reshape(-1)
