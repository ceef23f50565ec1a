"""Device sparse-matrix containers (the TPU replacement of the reference's
``StiffnessMatrix`` = Eigen CSC double — reference src/polysolve/Types.hpp:11-15).

On TPU everything under ``jit`` needs static shapes, so the canonical device
format is **padded-row ELL**: each row stores exactly ``W`` (column, value)
slots, where ``W`` is the maximum row degree (FEM matrices have near-uniform
row degree, so padding waste is small). Padding slots carry ``col = 0`` and
``val = 0`` — the gather stays in-bounds and contributes nothing.

SpMV then is ``(vals * x[cols]).sum(axis=1)`` — a gather + row reduction that
XLA vectorizes on the VPU; the Pallas fast path lives in
``polysolve_tpu.ops.spmv``.

For vector-valued FEM problems (2/3 dofs per node — the reference's
``AMGCL_Block<2/3>`` AMGCL.hpp:48-98 and MAS ``block_dim`` MASSolver.cu:198) the
block variant ``BlockELLMatrix`` stores dense ``b×b`` blocks, turning the inner
product into small matmuls.

Host-side matrices are plain ``scipy.sparse`` (the analysis / setup phases run
on host, like the reference's symbolic phases).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from flax import struct


def default_dtype() -> jnp.dtype:
    """fp64 when x64 is enabled (CPU / parity tests — the reference is
    double-only), else fp32 (TPU hardware path)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# --------------------------------------------------------------------------- #
# ELL (padded CSR)                                                            #
# --------------------------------------------------------------------------- #


@struct.dataclass
class ELLMatrix:
    """Padded-row sparse matrix. ``vals[i, k]`` pairs with column
    ``cols[i, k]``; padded slots have ``val == 0``.

    Fields
    ------
    vals : (n_rows, width) float
    cols : (n_rows, width) int32
    shape : static (n_rows, n_cols)
    nnz : static true non-zero count (excludes padding)
    """

    vals: jnp.ndarray
    cols: jnp.ndarray
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def width(self) -> int:
        return self.vals.shape[1]

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return ell_matvec(self, x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        return ell_rmatvec(self, y)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        return ell_matmat(self, X)

    def diagonal(self) -> jnp.ndarray:
        """Main diagonal (rows beyond a rectangular matrix's diagonal get 0)."""
        n = self.shape[0]
        row_ids = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        on_diag = (self.cols == row_ids) & (self.vals != 0)
        return jnp.sum(jnp.where(on_diag, self.vals, 0), axis=1)


def ell_matvec(A: ELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x via gather + row-sum. Padding (val 0) is harmless."""
    return jnp.sum(A.vals * x[A.cols], axis=1)


def ell_rmatvec(A: ELLMatrix, y: jnp.ndarray) -> jnp.ndarray:
    """x = A.T @ y via scatter-add (needed by least-squares CG — the
    reference's Eigen::LeastSquaresConjugateGradient path, Solver.cpp:444-451)."""
    contrib = A.vals * y[:, None]
    return jnp.zeros(A.shape[1], dtype=A.vals.dtype).at[A.cols].add(contrib)


def ell_matmat(A: ELLMatrix, X: jnp.ndarray) -> jnp.ndarray:
    """Y = A @ X for dense multi-RHS (n_cols, k) — SpMM."""
    return jnp.einsum("rw,rwk->rk", A.vals, X[A.cols])


def ell_from_scipy(A: sp.spmatrix, dtype=None, width: Optional[int] = None,
                   min_width: int = 1) -> ELLMatrix:
    """Convert any scipy sparse matrix to a device ``ELLMatrix``."""
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    dtype = dtype or default_dtype()
    n, m = A.shape
    deg = np.diff(A.indptr)
    W = int(max(deg.max(initial=0), min_width)) if width is None else int(width)
    if deg.max(initial=0) > W:
        raise ValueError(f"requested ELL width {W} < max row degree {deg.max()}")
    packed = None
    if n >= 10000:  # native packer (cpp/host_kernels.cpp csr_to_ell)
        from polysolve_tpu import native

        packed = native.csr_to_ell(A, W)
    if packed is not None:
        cols, vals, _ = packed
    else:
        cols = np.zeros((n, W), dtype=np.int32)
        vals = np.zeros((n, W), dtype=np.float64)
        # ragged rows -> padded rows
        idx = np.arange(len(A.indices))
        row_of = np.repeat(np.arange(n), deg)
        pos_in_row = idx - A.indptr[row_of]
        cols[row_of, pos_in_row] = A.indices
        vals[row_of, pos_in_row] = A.data
    return ELLMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        cols=jnp.asarray(cols),
        shape=(n, m),
        nnz=int(A.nnz),
    )


def ell_to_scipy(A: ELLMatrix) -> sp.csr_matrix:
    vals = np.asarray(A.vals)
    cols = np.asarray(A.cols)
    n, W = vals.shape
    rows = np.repeat(np.arange(n), W)
    M = sp.coo_matrix((vals.ravel(), (rows, cols.ravel())), shape=A.shape)
    M.sum_duplicates()
    M = M.tocsr()
    M.eliminate_zeros()
    return M


# --------------------------------------------------------------------------- #
# Block ELL (BSR analog)                                                      #
# --------------------------------------------------------------------------- #


@struct.dataclass
class BlockELLMatrix:
    """Padded block-row sparse matrix of dense ``b×b`` blocks.

    Fields
    ------
    vals : (n_brows, width, b, b) float — dense blocks
    bcols : (n_brows, width) int32 — block-column indices (0 for padding)
    shape : static scalar shape (n, m), multiples of b
    block_size : static b
    nnz : static scalar nnz of the original matrix
    """

    vals: jnp.ndarray
    bcols: jnp.ndarray
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def width(self) -> int:
        return self.vals.shape[1]

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return bell_matvec(self, x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        return bell_rmatvec(self, y)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        b = self.block_size
        nb = self.shape[1] // b
        Xb = X.reshape(nb, b, -1)
        gathered = Xb[self.bcols]                     # (nb_r, W, b, k)
        Yb = jnp.einsum("rwij,rwjk->rik", self.vals, gathered)
        return Yb.reshape(self.shape[0], -1)

    def diagonal(self) -> jnp.ndarray:
        b = self.block_size
        nb = self.shape[0] // b
        row_ids = jnp.arange(nb, dtype=self.bcols.dtype)[:, None]
        on_diag = (self.bcols == row_ids)[..., None, None]
        diag_blocks = jnp.sum(jnp.where(on_diag, self.vals, 0), axis=1)  # (nb,b,b)
        return jax.vmap(jnp.diag)(diag_blocks).reshape(-1)

    def diagonal_blocks(self) -> jnp.ndarray:
        """(nb, b, b) dense diagonal blocks (block-Jacobi setup)."""
        nb = self.shape[0] // self.block_size
        row_ids = jnp.arange(nb, dtype=self.bcols.dtype)[:, None]
        on_diag = (self.bcols == row_ids)[..., None, None]
        return jnp.sum(jnp.where(on_diag, self.vals, 0), axis=1)


def bell_matvec(A: BlockELLMatrix, x: jnp.ndarray) -> jnp.ndarray:
    b = A.block_size
    nb = A.shape[1] // b
    xb = x.reshape(nb, b)
    gathered = xb[A.bcols]                            # (nb_r, W, b)
    yb = jnp.einsum("rwij,rwj->ri", A.vals, gathered)
    return yb.reshape(-1)


def bell_rmatvec(A: BlockELLMatrix, y: jnp.ndarray) -> jnp.ndarray:
    """x = Aᵀ @ y via blockwise transpose + scatter-add (padding blocks are
    all-zero, so their contributions vanish)."""
    b = A.block_size
    nbr = A.shape[0] // b
    mb = A.shape[1] // b
    yb = y.reshape(nbr, b)
    contrib = jnp.einsum("rwij,ri->rwj", A.vals, yb)   # (nbr, W, b)
    zb = jnp.zeros((mb, b), dtype=A.vals.dtype).at[A.bcols].add(contrib)
    return zb.reshape(-1)


def bell_from_scipy(A: sp.spmatrix, block_size: int, dtype=None) -> BlockELLMatrix:
    """Convert scipy sparse to block-ELL. ``A.shape`` must be divisible by
    ``block_size`` (the reference pads the tail block with identity —
    BSRMatrix.cu:137-200; here FEM callers always have n % b == 0, and we pad
    explicitly if not)."""
    dtype = dtype or default_dtype()
    b = int(block_size)
    n, m = A.shape
    n_pad = (-n) % b
    m_pad = (-m) % b
    if n_pad or m_pad:
        # pad with identity on the diagonal tail (reference BSRMatrix.cu:180-200)
        A = sp.bmat(
            [[A, None], [None, sp.identity(max(n_pad, m_pad), format="csr")]],
            format="csr",
        )[: n + n_pad, : m + m_pad]
        n, m = A.shape
    Ab = sp.bsr_matrix(sp.csr_matrix(A), blocksize=(b, b))
    Ab.sort_indices()
    nbr = n // b
    deg = np.diff(Ab.indptr)
    W = int(max(deg.max(initial=0), 1))
    bcols = np.zeros((nbr, W), dtype=np.int32)
    vals = np.zeros((nbr, W, b, b), dtype=np.float64)
    row_of = np.repeat(np.arange(nbr), deg)
    pos = np.arange(len(Ab.indices)) - Ab.indptr[row_of]
    bcols[row_of, pos] = Ab.indices
    vals[row_of, pos] = Ab.data
    return BlockELLMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        bcols=jnp.asarray(bcols),
        shape=(n, m),
        block_size=b,
        nnz=int(A.nnz),
    )


# --------------------------------------------------------------------------- #
# DIA (diagonal) — the structured-grid fast path                              #
# --------------------------------------------------------------------------- #


@struct.dataclass
class DIAMatrix:
    """Diagonal-storage sparse matrix: ``A[i, i + offsets[k]] = vals[k, i]``.

    For stencil matrices (3D Poisson: 7 or 27 diagonals) this eliminates the
    gather entirely — SpMV is a sum of statically-shifted elementwise
    multiply-adds. This is the TPU answer to the reference's cuSPARSE CSR
    SpMV (CuSparseWrapper.hpp:13-60): instead of optimizing irregular access,
    the format removes the irregularity. The Pallas fast path lives in
    ``ops.spmv.pallas_dia_matvec``.

    Storage is **diag-major (K, n)**: each diagonal is contiguous, and a
    VMEM tile (K, T) occupies K·T lanes — the row-major (T, K) layout would
    pad K up to the 128-lane tile and blow VMEM 128/K-fold.

    Fields
    ------
    vals : (K, n) float — vals[k, i] pairs with column i + offsets[k]
           (out-of-range entries are 0)
    offsets : static tuple of K ints
    shape : static (n, n)
    nnz : static true nnz
    """

    vals: jnp.ndarray
    offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return dia_matvec(self, x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        return dia_rmatvec(self, y)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        n = self.shape[0]
        L = max(0, -min(self.offsets))
        R = max(0, max(self.offsets))
        Xp = jnp.pad(X, ((L, R), (0, 0)))
        y = jnp.zeros_like(X)
        for k, off in enumerate(self.offsets):
            y = y + self.vals[k][:, None] * jax.lax.slice_in_dim(Xp, L + off, L + off + n)
        return y

    def diagonal(self) -> jnp.ndarray:
        if 0 in self.offsets:
            return self.vals[self.offsets.index(0)]
        return jnp.zeros(self.shape[0], dtype=self.vals.dtype)


def dia_matvec(A: DIAMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x as K statically-shifted fused multiply-adds (no gather)."""
    n = A.shape[0]
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    xp = jnp.pad(x, (L, R))
    y = jnp.zeros(n, dtype=jnp.result_type(A.vals.dtype, x.dtype))
    for k, off in enumerate(A.offsets):
        y = y + A.vals[k] * jax.lax.slice_in_dim(xp, L + off, L + off + n)
    return y


def dia_rmatvec(A: DIAMatrix, y: jnp.ndarray) -> jnp.ndarray:
    """z = Aᵀ @ y. A[i, i+o] = vals[k, i] contributes vals[k, i]·y[i] to
    z[i+o]; each diagonal is one statically-shifted axpy into a padded
    accumulator (no gather/scatter — same streaming structure as dia_matvec)."""
    n = A.shape[0]
    L = max(0, -min(A.offsets))
    R = max(0, max(A.offsets))
    zp = jnp.zeros(n + L + R, dtype=jnp.result_type(A.vals.dtype, y.dtype))
    for k, off in enumerate(A.offsets):
        zp = jax.lax.dynamic_update_slice(
            zp,
            jax.lax.dynamic_slice(zp, (L + off,), (n,)) + A.vals[k] * y,
            (L + off,),
        )
    return jax.lax.slice_in_dim(zp, L, L + n)


def diag_analysis(A: sp.spmatrix):
    """(coo, offsets, diag-index-per-entry) of a CSR/COO matrix. Bandwidth-
    bounded bincount + lookup table instead of a sort-based ``np.unique`` —
    the unique over all nnz dominated AMG setup time at 1M+ rows (it runs
    once per level for the format probe and again for the DIA build)."""
    C = A if sp.issparse(A) and A.format == "coo" else A.tocoo()
    d = C.col.astype(np.int64) - C.row.astype(np.int64)
    if len(d) == 0:
        return C, np.zeros(0, np.int64), np.zeros(0, np.int64)
    dmin, dmax = int(d.min()), int(d.max())
    span = dmax - dmin + 1
    if span > (1 << 22):  # unbanded pattern: LUT too big, sort instead
        offs, inv = np.unique(d, return_inverse=True)
        return C, offs, inv
    shifted = d - dmin
    cnt = np.bincount(shifted, minlength=span)
    offs = np.flatnonzero(cnt).astype(np.int64)
    lut = np.zeros(span, dtype=np.int64)
    lut[offs] = np.arange(len(offs))
    return C, offs + dmin, lut[shifted]


def dia_from_scipy(A: sp.spmatrix, dtype=None, max_diags: int = 256,
                   analysis=None) -> DIAMatrix:
    """Convert to DIA. Raises if the pattern has more than ``max_diags``
    distinct diagonals (then ELL is the right format). Built with one
    vectorized scatter (scipy's ``todia`` is a per-diagonal loop and warns
    above ~100 diagonals — the AMG coarse levels hit that every setup).
    ``analysis`` forwards a precomputed ``diag_analysis`` result (the format
    probe in ``ops.spmv.to_device_matrix`` already ran one)."""
    dtype = dtype or default_dtype()
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    n = A.shape[0]
    C, offs, inv = analysis if analysis is not None else diag_analysis(A)
    if len(offs) > max_diags:
        raise ValueError(
            f"matrix has {len(offs)} diagonals > max_diags={max_diags}"
        )
    vals = np.zeros((len(offs), n), dtype=np.float64)
    vals[inv, C.row] = C.data  # row-aligned: vals[k, i] pairs column i+off_k
    return DIAMatrix(
        vals=jnp.asarray(vals, dtype=dtype),
        offsets=tuple(int(o) for o in offs),
        shape=(n, n),
        nnz=int(A.nnz),
    )


def sparse_identity(n: int, dtype=None) -> ELLMatrix:
    """Device identity (reference Utils.cpp:71-76)."""
    dtype = dtype or default_dtype()
    return ELLMatrix(
        vals=jnp.ones((n, 1), dtype=dtype),
        cols=jnp.arange(n, dtype=jnp.int32)[:, None],
        shape=(n, n),
        nnz=n,
    )


@struct.dataclass
class DenseOpMatrix:
    """Dense device operator for small AMG coarse levels.

    On TPU a dense (n, n) matvec is one MXU pass; the ELL/XLA-gather
    alternative was measured at 24.5 ms per matvec for n=4096 (the same
    dense matvec streams 67 MB ≈ 0.15 ms). Used by the AMG hierarchy for
    levels with n ≤ dense_level (amg.py) — the TPU analog of the
    reference's dense coarse handling (batched inverses in
    MASPreconditioner.cu:798-936, AMGCL's direct coarse solve).
    """

    vals: jnp.ndarray  # (n, n)
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def dtype(self):
        return self.vals.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(self.vals, x, preferred_element_type=self.vals.dtype)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(y, self.vals, preferred_element_type=self.vals.dtype)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(self.vals, X, preferred_element_type=self.vals.dtype)

    def diagonal(self) -> jnp.ndarray:
        return jnp.diagonal(self.vals)


def dense_from_scipy(A, dtype=None) -> DenseOpMatrix:
    import scipy.sparse as _sp

    dtype = dtype or default_dtype()
    M = _sp.csr_matrix(A)
    return DenseOpMatrix(vals=jnp.asarray(M.toarray(), dtype=dtype),
                         shape=tuple(M.shape), nnz=int(M.nnz))
