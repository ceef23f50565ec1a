"""SpMV / SpMM dispatch over device matrix formats + format auto-selection.

This is the hot kernel of the whole framework — the TPU replacement of the
reference's cuSPARSE SpMV inside the MAS PCG loop (reference
CuSparseWrapper.hpp:13-60, MASSolver.cu:469-595) and of Eigen's CSR matvec in
every iterative solver.

Format strategy (see SURVEY.md §7 hard-part #1):

- ``DIAMatrix``   — stencil/banded matrices: SpMV = statically-shifted fused
  multiply-adds, zero gathers, HBM-roofline streaming. Auto-picked when the
  pattern has few distinct diagonals (structured grids: 3D Poisson has 7/27).
- ``ELLMatrix``   — general unstructured: padded rows, one XLA gather + row
  reduction.
- ``BlockELLMatrix`` — vector-valued FEM (2/3 dofs per node): dense b×b blocks
  (reference AMGCL_Block AMGCL.hpp:48-98, MAS block_dim MASSolver.cu:198).

A Pallas DIA kernel (``pallas_dia_matvec``) exists for explicit control over
tiling; on current XLA the fused jnp formulation already saturates HBM, so the
default path is jnp and the Pallas kernel is opt-in (used by the benchmark for
comparison).
"""

from __future__ import annotations

import functools
from typing import Union

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from polysolve_tpu.types import (
    BlockELLMatrix,
    DIAMatrix,
    ELLMatrix,
    bell_from_scipy,
    dia_from_scipy,
    dia_matvec,
    ell_from_scipy,
)

DeviceMatrix = Union[ELLMatrix, BlockELLMatrix, DIAMatrix]


def matvec(A: DeviceMatrix, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(A, DIAMatrix) and use_pallas_dia():
        return pallas_dia_matvec(A, x)
    return A.matvec(x)


def matmat(A: DeviceMatrix, X: jnp.ndarray) -> jnp.ndarray:
    return A.matmat(X)


def rmatvec(A: DeviceMatrix, y: jnp.ndarray) -> jnp.ndarray:
    """x = Aᵀ @ y (least-squares paths — the reference's
    Eigen::LeastSquaresConjugateGradient, Solver.cpp:444-451)."""
    return A.rmatvec(y)


def to_device_matrix(
    A: sp.spmatrix,
    dtype=None,
    block_size: int = 1,
    prefer: str = "auto",
    dia_max_diags: int = 64,
    dia_fill_threshold: float = 0.55,
) -> DeviceMatrix:
    """Pick the best device format for ``A``.

    ``prefer`` one of {"auto", "ell", "dia", "bell"}. Auto rule: block_size>1
    -> block ELL; else DIA if the pattern has ≤ ``dia_max_diags`` distinct
    diagonals and the DIA storage is ≥ ``dia_fill_threshold`` full; else ELL.
    """
    A = sp.csr_matrix(A)
    if prefer == "bell" or (prefer == "auto" and block_size > 1):
        return bell_from_scipy(A, block_size=max(block_size, 1) if block_size > 1 else 2,
                               dtype=dtype)
    if prefer == "ell":
        return ell_from_scipy(A, dtype=dtype)
    if prefer == "dia":
        return dia_from_scipy(A, dtype=dtype, max_diags=10**9)
    # auto scalar: one shared diagonal analysis probes the format AND feeds
    # the DIA build (no second pass over the nnz)
    from polysolve_tpu import native
    from polysolve_tpu.types import DIAMatrix, default_dtype, diag_analysis

    A.sum_duplicates()
    n = A.shape[0]
    if A.shape[0] != A.shape[1]:
        return ell_from_scipy(A, dtype=dtype)  # DIA is square-only
    offs = native.dia_analyze(A, dia_max_diags)
    if offs is not None:
        # native probe: straight off the CSR index arrays; -1 ⇒ > cap ⇒ ELL
        if not np.isscalar(offs) and 0 < len(offs) and \
                A.nnz >= dia_fill_threshold * n * len(offs):
            vals = native.csr_to_dia(A, offs)
            if vals is not None:
                return DIAMatrix(
                    vals=jnp.asarray(vals, dtype=dtype or default_dtype()),
                    offsets=tuple(int(o) for o in offs),
                    shape=(n, n), nnz=int(A.nnz),
                )
        return ell_from_scipy(A, dtype=dtype)
    analysis = diag_analysis(A)
    diags = analysis[1]
    if 0 < len(diags) <= dia_max_diags and \
            A.nnz >= dia_fill_threshold * n * len(diags):
        return dia_from_scipy(A, dtype=dtype, max_diags=dia_max_diags,
                              analysis=analysis)
    return ell_from_scipy(A, dtype=dtype)


# --------------------------------------------------------------------------- #
# Pallas DIA SpMV kernel                                                      #
# --------------------------------------------------------------------------- #


_VMEM_BUDGET = 12 * 2**20  # leave headroom below the ~16MB/core VMEM


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(n: int, K: int, halo: int, itemsize: int = 4) -> int:
    """Largest power-of-two tile dividing n whose working set fits the VMEM
    budget: the grid pipeline double-buffers the vals block and the output
    (2·K·T + 2·T), plus the manually-DMA'd window (round_up(T+halo, 1024) —
    Mosaic requires 1024-aligned 1-D slice shapes). Capped at 2^17: larger
    1-D lane extents crash the TPU compile helper (measured, see
    experiments/spmv_pallas3.py). Minimum 1024 keeps slice *starts* aligned."""
    tile = 1 << 17
    while tile >= 1024:
        win = _round_up(tile + halo, 1024)
        if n % tile == 0 and (2 * K * tile + 2 * tile + win) \
                * itemsize <= _VMEM_BUDGET:
            return tile
        tile >>= 1
    return 0


def pallas_dia_matvec(A: DIAMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Pallas DIA SpMV: grid over row tiles; the vals tile streams through the
    grid pipeline, each tile's x window (tile + halo) is DMA'd HBM→VMEM once,
    and the K shifted multiply-adds happen in VMEM — a single pass over
    memory by construction (measured ~5× the fused-XLA formulation, which
    materializes every shifted operand; see experiments/spmv_pallas*.py).

    Falls back to the jnp path when no admissible tile exists."""
    n = A.shape[0]
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    K = len(A.offsets)
    itemsize = jnp.dtype(A.vals.dtype).itemsize
    tile = _pick_tile(n, K, L + R, itemsize)
    if tile and L <= tile and R <= tile:
        return _pallas_dia_overlap(A.vals, x, A.offsets, tile)
    # wide-halo / non-divisible rows (deep AMG coarse levels: K in the
    # hundreds, |offset| ≫ tile): run the batched kernel at B=1 — it
    # over-pads the row grid and only requires the window to fit VMEM.
    # TPU-only: direct callers on CPU still get the jnp fallback. Small
    # working sets stay jnp (VMEM-promotion hazard, see _MM_MIN_BYTES)
    if use_pallas_dia() and (K * n + 2 * n) * itemsize >= _MM_MIN_BYTES:
        out_bytes = n * itemsize
        reserve = out_bytes if out_bytes <= (17 << 20) else 0
        tile = _pick_tile_mm(n, K, L + R, 1, itemsize, reserve)
        if tile:
            return _pallas_dia_mm(A.vals, x[None, :], A.offsets, tile)[0]
    return dia_matvec(A, x)


@functools.partial(jax.jit, static_argnames=("offsets", "tile"))
def _pallas_dia_overlap(vals, x, offsets, tile):
    """vals in diag-major (K, n) layout — each (K, tile) VMEM block is K
    sublanes × tile lanes (row-major (tile, K) would pad K to 128 lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    left = max(0, -min(offsets))
    right = max(0, max(offsets))
    K = vals.shape[0]
    # Mosaic requires 1-D slice shapes aligned to the 1024 tiling: round the
    # DMA window up and over-pad x so the last tile's window stays in bounds
    win = -(-(tile + left + right) // 1024) * 1024
    xp = jnp.pad(x, (left, right + (win - (tile + left + right))))

    def kernel(vals_ref, xp_hbm, y_ref, xwin_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(i * tile, win)], xwin_ref, sem
        )
        cp.start()
        cp.wait()
        acc = vals_ref[0, :] * xwin_ref[left + offsets[0]: left + offsets[0] + tile]
        for k in range(1, K):
            acc = acc + vals_ref[k, :] * \
                xwin_ref[left + offsets[k]: left + offsets[k] + tile]
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((K, tile), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,)),
        scratch_shapes=[
            pltpu.VMEM((win,), vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(vals, xp)


def use_pallas_dia() -> bool:
    """Pallas fast path is on for real TPU backends (interpret-mode tests
    exercise the kernel on CPU explicitly)."""
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------- #
# Batched DIA SpMM, transposed layout — the AMG RAP-probe hot path            #
# --------------------------------------------------------------------------- #


def matmat_bt(A: DeviceMatrix, Xt: jnp.ndarray) -> jnp.ndarray:
    """Yt[b] = A @ Xt[b] for a (B, n) batch in TRANSPOSED layout (batch on
    sublanes, vector on lanes — the TPU orientation: B stays a few sublane
    groups while n runs along the fast lane axis; a (n, B) layout would pad
    B to 128 lanes and waste ~16× of the x/y traffic).

    For DIA this is the high-arithmetic-intensity form used by the AMG RAP
    probe (amg._probe_structured_rap): the (K, n) vals plane streams from
    HBM ONCE per call, reused across all B columns — vs B separate matvecs
    streaming it B times (the round-3 probe cost). Non-DIA operators fall
    back to a lax.map of matvec (correctness path; probe callers are
    DIA-only)."""
    if isinstance(A, DIAMatrix):
        if use_pallas_dia():
            y = pallas_dia_matmat_bt(A, Xt)
            if y is not None:
                return y
        return dia_matmat_bt_jnp(A, Xt)
    return jax.lax.map(lambda v: matvec(A, v), Xt)


def dia_matmat_bt_jnp(A: DIAMatrix, Xt: jnp.ndarray) -> jnp.ndarray:
    """jnp fallback: K statically-shifted FMAs on the (B, n) batch."""
    n = A.shape[0]
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    Xp = jnp.pad(Xt, ((0, 0), (L, R)))
    Y = jnp.zeros(Xt.shape, dtype=jnp.result_type(A.vals.dtype, Xt.dtype))
    for k, off in enumerate(A.offsets):
        Y = Y + A.vals[k][None, :] * jax.lax.slice_in_dim(
            Xp, L + off, L + off + n, axis=1)
    return Y


# Working sets below this run the fused-jnp path: XLA promotes small pallas
# operands/outputs into VMEM on top of the kernel's scoped scratch, which
# OOMs the 16 MB space (measured: f32[33,32768] probe at the m=64 level-1 —
# "scoped allocation 44.57M exceeded scoped vmem limit"). Promotion needs
# every tensor ≤ VMEM, so a comfortably-HBM-sized working set is immune.
_MM_MIN_BYTES = 64 * 2**20
# scoped budget for the batched kernel: the cost model below matched the
# compiler's reported scoped allocation to 0.6% (17.2 MB predicted vs
# 17.09 MB measured at K=33/B=32/T=8192), so 15 MB leaves ~1 MB of margin
# under the 16 MB space
_VMEM_BUDGET_MM = 15 * 2**20


def _pick_tile_mm(n: int, K: int, halo: int, B: int, itemsize: int = 4,
                  reserve: int = 0) -> int:
    """Row tile for the batched kernel. Scoped-VMEM cost model (calibrated
    against the compiler's 'scoped allocation' reports): vals double-buffer
    2·K·T + out double-buffer 2·B·T + the (B, win) x window + the acc
    scratch and ~min(K, 8) live window slices (the scheduler keeps several
    (B, T) slices in flight even with the scratch accumulator). Unlike the
    1-D kernel the tile need NOT divide n (rows are over-padded to the
    grid); it only has to keep window starts 1024-aligned. ``reserve``
    subtracts bytes XLA may additionally place in VMEM (a promotable
    output — see _MM_MIN_BYTES)."""
    tile = 1 << 15
    while tile >= 1024:
        win = _round_up(tile + halo, 1024)
        # live = K: Mosaic keeps essentially EVERY (B, tile) window slice
        # of the unrolled K loop alive (measured 72.7 MB scoped at
        # K=179/B=64/T=2048 — ~129 live slices — even with the scratch
        # accumulator forcing read-modify-write order). Wide-K operators
        # therefore fall back to the fused-jnp path; the pallas win is for
        # the small-stencil fine levels where vals streaming dominates.
        live = 1 + K
        if (2 * K * tile + (2 + live) * B * tile + B * win) * itemsize \
                <= _VMEM_BUDGET_MM - reserve:
            return tile
        tile >>= 1
    return 0


def pallas_dia_matmat_bt(A: DIAMatrix, Xt: jnp.ndarray):
    """Pallas batched DIA SpMM; returns None when no admissible tile exists
    (caller falls back to the jnp formulation)."""
    n = A.shape[0]
    B = int(Xt.shape[0])
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    K = len(A.offsets)
    itemsize = jnp.dtype(A.vals.dtype).itemsize
    if (K * n + 2 * B * n) * itemsize < _MM_MIN_BYTES:
        return None                      # VMEM-promotion hazard: jnp path
    # inputs are pinned to HBM inside _pallas_dia_mm; the OUTPUT cannot be
    # pinned — if it fits VMEM solo, budget for XLA promoting it
    out_bytes = B * n * itemsize
    reserve = out_bytes if out_bytes <= (17 << 20) else 0
    tile = _pick_tile_mm(n, K, L + R, B, itemsize, reserve)
    if tile == 0:
        return None
    return _pallas_dia_mm(A.vals, Xt, A.offsets, tile)


@functools.partial(jax.jit, static_argnames=("offsets", "tile"))
def _pallas_dia_mm(vals, Xt, offsets, tile):
    """Grid over row tiles; each step DMAs one (B, win) x window HBM→VMEM
    and runs the K shifted multiply-adds broadcast over the B sublanes.
    vals is diag-major (K, n) — the same layout invariant as the matvec
    kernel (CLAUDE.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = Xt.shape
    left = max(0, -min(offsets))
    right = max(0, max(offsets))
    K = vals.shape[0]
    n_pad = _round_up(n, tile)
    win = _round_up(tile + left + right, 1024)
    vals_p = jnp.pad(vals, ((0, 0), (0, n_pad - n)))
    # x over-padded so the last tile's window stays in bounds:
    # len = n_pad - tile + win exactly covers window start (n_pad/tile-1)·tile
    Xp = jnp.pad(Xt, ((0, 0),
                      (left, (n_pad - n) + right
                       + (win - (tile + left + right)))))
    # pin both inputs to HBM: XLA promotes small pallas operands into VMEM
    # on top of the kernel's scoped scratch — measured OOM at the m=64
    # level-1 probe ("scoped allocation 44.57M exceeded scoped vmem limit")
    vals_p = pltpu.with_memory_space_constraint(vals_p, pltpu.MemorySpace.HBM)
    Xp = pltpu.with_memory_space_constraint(Xp, pltpu.MemorySpace.HBM)

    def kernel(vals_ref, xp_hbm, y_ref, xwin_ref, acc_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xp_hbm.at[:, pl.ds(i * tile, win)], xwin_ref, sem)
        cp.start()
        cp.wait()
        # accumulate THROUGH the scratch ref: a pure value chain lets the
        # scheduler keep many (B, tile) window slices live at once — the
        # measured scoped-VMEM blowup at K=33 (28.5 MB vs the ~8 MB block
        # budget); the read-modify-write dependency bounds slice liveness
        acc_ref[:, :] = vals_ref[0:1, :] * \
            xwin_ref[:, left + offsets[0]: left + offsets[0] + tile]
        for k in range(1, K):
            acc_ref[:, :] += vals_ref[k:k + 1, :] * \
                xwin_ref[:, left + offsets[k]: left + offsets[k] + tile]
        y_ref[:, :] = acc_ref[:, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_pad), Xt.dtype),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((K, tile), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, tile), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((B, win), vals.dtype),
            pltpu.VMEM((B, tile), vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the compiler's scoped-vmem accounting exceeds the block/scratch
        # budget by an opaque scheduling-dependent margin (measured 17.09 MB
        # against an 11.5 MB block sum, crashing the default 16 MB limit);
        # v5e has ~128 MB of physical VMEM — raise the cap and keep the
        # _pick_tile_mm budget as the real working-set control
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(_VMEM_BUDGET_MM + 32 * 2**20)),
    )(vals_p, Xp)
    return out[:, :n] if n_pad != n else out
