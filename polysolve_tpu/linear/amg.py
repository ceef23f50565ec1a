"""Smoothed-aggregation algebraic multigrid — the TPU-native replacement of
both AMGCL (smoothed_aggregation + chebyshev relaxation, reference
AMGCL.cpp:32-65) and Hypre BoomerAMG (HypreSolver.cpp:157-272), per
SURVEY.md §7 step 6.

Split:

- **setup** (host, numpy/scipy — the analog of AMGCL's setup on CPU):
  strength-of-connection graph → MIS-based greedy aggregation → tentative
  prolongator with QR-localized near-nullspace (rigid-body modes supported,
  mirroring ``set_is_nullspace`` / Hypre's GM interpolation
  HypreSolver.cpp:191-272) → Jacobi-smoothed P → Galerkin RAP, down to
  ``coarse_enough`` unknowns or ``max_levels`` (default 6, AMGCL.cpp:32-65).

- **cycle** (device, fully jittable): V- or W-cycle with Chebyshev smoothing
  (polynomial in A — only SpMVs, no sequential Gauss–Seidel; the natural TPU
  smoother, same family as the reference's chebyshev relaxation), coarsest
  level solved with a dense XLA LU.

The device state is a pytree (levels as a tuple of structs), so the cycle is
recursion over a *static* level index — XLA unrolls it into one fused program.
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from flax import struct

from polysolve_tpu import native, ops
from polysolve_tpu.types import default_dtype, ell_from_scipy


# --------------------------------------------------------------------------- #
# Device state                                                                #
# --------------------------------------------------------------------------- #


@struct.dataclass
class AMGLevel:
    A: Any                     # device matrix (ELL/DIA)
    P: Any                     # prolongator (ELL, n_f × n_c) — None on
    R: Any                     # structured levels (R likewise)
    theta: jnp.ndarray         # 1st-kind chebyshev center
    delta: jnp.ndarray         # 1st-kind chebyshev half-width
    Dinv: Any                  # 1/diag — smoother scaling + structured transfer
    w_smooth: Any              # ω/ρ prolongator smoothing weight; else None
    rho_da: jnp.ndarray        # ρ(D⁻¹A) upper bound (4th-kind smoother)
    degree: int = struct.field(pytree_node=False)
    # "cheb4": Jacobi-scaled 4th-kind Chebyshev (needs only the upper bound —
    # the optimal-polynomial-smoother result, arXiv:2407.09848 / Lottes);
    # "cheb1": classic bracketed 1st-kind (the AMGCL default family)
    smoother: str = struct.field(pytree_node=False, default="cheb4")
    # grid dims when the level uses structured (gather-free) transfers:
    # T = 2× box broadcast, Tᵀ = reshape-sum, P = (I − ωD⁻¹A)·T as a DIA
    # matvec — no irregular memory access anywhere in the cycle (XLA gather
    # on TPU measured 0.13 Gnnz/s vs 80 for the DIA kernel)
    grid: Any = struct.field(pytree_node=False, default=None)


@struct.dataclass
class AMGState:
    levels: Tuple[AMGLevel, ...]
    # precomputed dense inverse of the coarsest operator: apply = one MXU
    # matvec. A triangular lu_solve is sequential substitution on TPU —
    # measured 2.9 ms per apply at n=512 vs ~µs for the matvec (the
    # reference inverts its coarse matrices too, MASPreconditioner.cu:798)
    coarse_inv: jnp.ndarray
    ncycle: int = struct.field(pytree_node=False)
    # AMG iterations per preconditioner application — the Hypre
    # ``pre_max_iter`` knob (HYPRE_BoomerAMGSetMaxIter on the precond
    # instance, reference HypreSolver.cpp:50-52, :186-189)
    pre_cycles: int = struct.field(pytree_node=False, default=1)


def chebyshev1(A, theta, delta, degree: int, r, Dinv=None):
    """z ≈ A⁻¹ r by degree-d 1st-kind Chebyshev on [θ−δ, θ+δ] (zero guess).

    With ``Dinv`` the polynomial runs in the Jacobi-scaled operator D⁻¹A
    (brackets then refer to its spectrum) — AMGCL's ``relax.scale: true``
    (reference AMGCL.cpp:36-43); the unscaled variant is useless on
    operators with heterogeneous diagonals (elasticity). Symmetric either
    way: p(D⁻¹A)D⁻¹ = D^{-1/2} p(D^{-1/2}AD^{-1/2}) D^{-1/2}.

    The single canonical copy — the standalone Chebyshev preconditioner
    (preconditioners.ChebyshevP) applies this same recurrence."""
    scale = (lambda v: Dinv * v) if Dinv is not None else (lambda v: v)
    sigma = theta / delta
    rho = 1.0 / sigma
    d = scale(r) / theta
    z = d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * scale(
            r - ops.matvec(A, z))
        z = z + d
        rho = rho_new
    return z


def _chebyshev4(A, Dinv, rho, degree: int, b):
    """Jacobi-scaled 4th-kind Chebyshev smoother (zero initial guess):
    z = p(D⁻¹A)·D⁻¹ b with p the normalized 4th-kind Chebyshev polynomial on
    (0, ρ(D⁻¹A)] — optimal-smoother coefficients β_k = (2k−1)/(2k+3),
    γ_k = (8k+4)/((2k+3)ρ); needs no lower spectral bound
    (arXiv:2407.09848; Lottes 2022). Symmetric as an operator, so the
    V-cycle stays a valid SPD CG preconditioner."""
    r = b
    d = (4.0 / (3.0 * rho)) * (Dinv * r)
    z = jnp.zeros_like(b)
    for k in range(1, degree + 1):
        z = z + d
        if k == degree:
            break
        r = r - ops.matvec(A, d)
        d = ((2.0 * k - 1.0) / (2.0 * k + 3.0)) * d \
            + ((8.0 * k + 4.0) / (2.0 * k + 3.0) / rho) * (Dinv * r)
    return z


def _smooth(lev: "AMGLevel", r):
    if lev.smoother == "cheb4":
        return _chebyshev4(lev.A, lev.Dinv, lev.rho_da, lev.degree, r)
    return chebyshev1(lev.A, lev.theta, lev.delta, lev.degree, r,
                      Dinv=lev.Dinv)


@functools.lru_cache(maxsize=64)
def _expand_matrix(g: int) -> np.ndarray:
    """(g, g//2) one-hot: E[f, c] = 1 iff f // 2 == c (box membership)."""
    E = np.zeros((g, g // 2), dtype=np.float32)
    E[np.arange(g), np.arange(g) // 2] = 1.0
    return E


def _t_apply(grid, xc: jnp.ndarray) -> jnp.ndarray:
    """Structured tentative prolongation: coarse value broadcast over its
    2^d box, scaled 1/√(2^d) (matches the QR-normalized indicator columns).

    Implemented as one small dense matmul per axis (tensordot with the
    (g, g/2) one-hot): pure MXU work with contiguous layouts. The previous
    ``jnp.repeat``-per-axis chain forced lane-interleaving relayouts on TPU
    — measured 11 ms per restrict+prolong pair at n=7.08M vs ~0.5 ms of
    raw bandwidth (experiments/amg_cycle_profile_results.jsonl m=192)."""
    d = len(grid)
    cg = tuple(g // 2 for g in grid)
    x = xc.reshape(cg)
    for ax, g in enumerate(grid):
        E = jnp.asarray(_expand_matrix(g), dtype=xc.dtype)
        # contract the coarse axis with E's column index; the fine axis
        # lands at the end — move it back in place. HIGHEST precision: the
        # TPU default runs fp32 dots as ONE bf16 MXU pass (~1e-3 rel error)
        # — enough to fail the RAP probe verification and degrade the
        # hierarchy; one-hot contractions are bandwidth-bound so the 3-pass
        # fp32 emulation costs nothing
        x = jnp.moveaxis(jnp.tensordot(x, E, axes=[[ax], [1]],
                                       precision=jax.lax.Precision.HIGHEST),
                         -1, ax)
    return x.reshape(-1) * np.float64(1.0 / np.sqrt(2.0 ** d)).astype(xc.dtype)


def _tT_apply(grid, y: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of _t_apply: sum over each 2^d box — the same axis-wise
    one-hot contraction with E transposed."""
    d = len(grid)
    x = y.reshape(grid)
    for ax, g in enumerate(grid):
        E = jnp.asarray(_expand_matrix(g), dtype=y.dtype)
        x = jnp.moveaxis(jnp.tensordot(x, E, axes=[[ax], [0]],
                                       precision=jax.lax.Precision.HIGHEST),
                         -1, ax)
    return x.reshape(-1) * np.float64(1.0 / np.sqrt(2.0 ** d)).astype(y.dtype)


# --------------------------------------------------------------------------- #
# Device-probed Galerkin RAP (structured levels)                               #
#                                                                              #
# The host spgemm chain (DA@P_tent, A@P, R@AP per level) was measured at      #
# ~70 s of the 122 s setup at n=7.08M on this 2-core host. On structured      #
# grids the transfers are matrix-free (T box + Jacobi smoothing), so the      #
# coarse operator can be computed ON DEVICE by stencil-colored probing:       #
# Ac·e_S for one probe vector per color class S (classes spaced wider than    #
# the coarse stencil never overlap), then the DIA diagonals are read off      #
# Y[cls[i+off], i]. Exact given a correct stencil-radius bound; a random      #
# matvec check verifies and falls back to the host spgemm path otherwise.     #
# --------------------------------------------------------------------------- #


def _axis_radii(offsets, grid) -> Tuple[int, ...]:
    """Per-axis stencil radius of a DIA operator on a lex-ordered grid
    (balanced de-linearization of each offset; |d_ax| < grid_ax assumed —
    true for any stencil that is not grid-wrapping)."""
    d = len(grid)
    strides = [1] * d
    for ax in range(d - 2, -1, -1):
        strides[ax] = strides[ax + 1] * grid[ax + 1]
    r = [0] * d
    for off in offsets:
        rem = int(off)
        for ax in range(d):
            q = int(round(rem / strides[ax]))
            # balanced: pick the component minimizing the remainder
            best, bq = None, None
            for cand in (q - 1, q, q + 1):
                rr = rem - cand * strides[ax]
                if best is None or abs(rr) < abs(best):
                    best, bq = rr, cand
            rem = best
            r[ax] = max(r[ax], abs(bq))
    return tuple(r)


@functools.lru_cache(maxsize=32)
def _power_v0(n: int, dtype_name: str):
    """Power-iteration start vector, DEVICE-CACHED per (n, dtype):
    shipping a fresh host RNG vector through the tunnel cost ~2.5 s per
    refactorize at n=7.08M (the round-4 'L0_power' line item). The exact
    rng(0) vector is kept so the device-probed RAP path's ρ estimate stays
    bit-comparable with the host spgemm path's (probe-parity tests)."""
    v = np.random.default_rng(0).standard_normal(n)
    return jnp.asarray(v, dtype=dtype_name)


@functools.partial(jax.jit, static_argnames=("iters",))
def _power_iter_dia(A_dev, Dinv, v0, iters: int = 20):
    """ρ(D⁻¹A) by device power iteration (the host scipy version cost ~14 s
    across levels at n=7.08M; here it is `iters` DIA matvecs)."""

    def body(i, carry):
        v, lam = carry
        w = Dinv * ops.matvec(A_dev, v)
        lam = jnp.sqrt(jnp.vdot(w, w))
        return (w / jnp.maximum(lam, 1e-300), lam)

    v0 = v0 / jnp.maximum(jnp.sqrt(jnp.vdot(v0, v0)), 1e-300)
    _, lam = jax.lax.fori_loop(0, iters, body, (v0, jnp.ones((), v0.dtype)))
    return lam


_PROBE_B = 32      # default probe columns per batched-SpMM chunk
# offsets per extract program (fixed-shape chunks). 128, not 1024: the
# extract output materializes (C_pad, n_c) on device and every padded
# offset costs one full-width gather — padding the fine level's 125
# candidates to 1024 made a 3.6 GB array and 20.8 s of the measured
# 39.6 s refactorize at n=7.08M (round4 L0_probe_extract_s). Mile-long
# scans also wedge the compile helper; 128-step scans are safe.
_EXTRACT_CHUNK = 128


def _pick_probe_b(A_dev, n_cls: int, itemsize: int = 4) -> int:
    """Probe batch width per level, chosen by MINIMIZING total probe HBM
    traffic jointly with the kernel tile: bigger B amortizes the (K, n)
    vals stream across more columns, but shrinks the admissible tile (the
    live=K VMEM budget) and the x-window read per tile is win ≈ T + halo —
    at the 7.08M fine level B=32 forced T=2048 with a 37× window-overlap
    factor (~34 GB of x reads per SpMM, the measured L0 refactorize cost)
    while B=8 admits T=16384 at ~1.3 GB. Output promotion is budgeted via
    the reserve term (ops/spmv.py)."""
    from polysolve_tpu.ops import spmv as _sm

    n = A_dev.shape[0]
    K = len(A_dev.offsets)
    halo = max(0, -min(A_dev.offsets)) + max(0, max(A_dev.offsets))
    best, bestB = None, _PROBE_B
    for B in (8, 16, 32, 64, 128):
        out_bytes = B * n * itemsize
        reserve = out_bytes if out_bytes <= (17 << 20) else 0
        T = _sm._pick_tile_mm(n, K, halo, B, itemsize, reserve)
        if T == 0:
            continue
        win = _sm._round_up(T + halo, 1024)
        per_spmm = (K * n + (n // T + 1) * win * B + 2 * B * n) * itemsize
        traffic = -(-n_cls // B) * per_spmm
        if best is None or traffic < best:
            best, bestB = traffic, B
    return bestB


@functools.partial(jax.jit, static_argnames=("grid",))
def _rap_apply_bt(A_dev, Dinv, w, E, grid):
    """(R·A·P) applied to a (B, n_c) block of vectors in transposed-batch
    layout; returns (B, n_c). P = (I − ωD⁻¹A)T, R = Pᵀ — identical formulas
    to _p_apply/_r_apply, so the probed coarse operator is
    Galerkin-consistent with the device cycle's transfers by construction.
    The four A-applications are batched DIA SpMMs (ops.matmat_bt): the
    (K, n) vals plane streams from HBM once per apply for all B columns."""
    t = jax.vmap(lambda e: _t_apply(grid, e))(E)
    p = t - w * (Dinv[None, :] * ops.matmat_bt(A_dev, t))
    q = ops.matmat_bt(A_dev, p)
    return jax.vmap(lambda v: _tT_apply(grid, v))(
        q - w * ops.matmat_bt(A_dev, Dinv[None, :] * q))


@functools.partial(jax.jit, static_argnames=("grid", "n_chunks", "B"))
def _rap_probe_all(A_dev, Dinv, w, cls, zv, grid, n_chunks: int,
                   B: int = _PROBE_B):
    """ALL probe responses in one device program: lax.map over column
    chunks of the batched composed apply. Probe indicators are built ON
    DEVICE from the class map (only scalars cross the tunnel), and one
    host→device call replaces one per chunk (~30 ms RTT each on axon).
    Returns (Y, yz): Y (n_chunks·B, n_c) — rows beyond the true class
    count are zero columns (never read by extraction) — and yz the
    composed response to the verification vector ``zv``, computed INSIDE
    the same program (a separate per-level verify jit cost 428 s of the
    round-4 cold setup in remote compiles and 12.3 s per refactorize)."""

    def one(q):
        cols = q * B + jnp.arange(B, dtype=jnp.int32)
        E = (cls[None, :] == cols[:, None]).astype(Dinv.dtype)
        return _rap_apply_bt(A_dev, Dinv, w, E, grid)

    Y = jax.lax.map(one, jnp.arange(n_chunks, dtype=jnp.int32))
    zb = jnp.zeros((B, cls.shape[0]), dtype=Dinv.dtype).at[0].set(zv)
    yz = _rap_apply_bt(A_dev, Dinv, w, zb, grid)[0]
    return Y.reshape(n_chunks * B, -1), yz


@jax.jit
def _extract_dia(Y, cls, offs_arr, deltas, coords, cg_arr):
    """vals[k, i] = Y[cls[i + offs[k]], i] masked by per-offset GEOMETRIC
    validity, computed ON DEVICE from the per-axis deltas: a linear offset
    that wraps an axis lands on a cell whose COLOR CLASS can contain a true
    stencil neighbor of i, so Y[cls[j], i] would read that neighbor's
    response — a plain 0≤i+off<n range mask is NOT sufficient (measured:
    rel 0.5 probe error on 24×24 without this). Callers pad offsets to
    _EXTRACT_CHUNK-sized pieces so every extract program has the same shape
    — mile-long scans (~5k steps) have wedged the axon compile helper
    indefinitely, and shipping host-built (K, n_c) masks cost ~180 MB of
    tunnel transfer per factorize."""

    R = Y.shape[0]

    def body(_, xs):
        off, delta = xs
        idx = jnp.roll(cls, -off)
        if R <= 256:
            # masked row-sum instead of the XLA sublane gather: the gather
            # runs ~0.13 G lookups/s on TPU, a dominant slice of the fine
            # level's extraction; at few probe rows the O(R·n_c) compare+
            # reduce is far cheaper vectorized work
            sel = (idx[None, :]
                   == jax.lax.broadcasted_iota(idx.dtype, (R, 1), 0))
            g = jnp.sum(Y * sel.astype(Y.dtype), axis=0)
        else:
            g = jnp.take_along_axis(Y, idx[None, :], axis=0)[0]
        moved = coords + delta[:, None]
        ok = jnp.all((moved >= 0) & (moved < cg_arr[:, None]), axis=0)
        return None, g * ok.astype(g.dtype)

    _, vals = jax.lax.scan(body, None, (offs_arr, deltas))
    return vals


@jax.jit
def _dia_action(vals, offs_arr, z):
    """y[i] = Σ_k vals[k, i]·z[i + offs[k]] as ONE gather program — the
    probed-operator action for verification. ops.matvec on a wide-K DIA
    unrolls K shifted FMAs: at the K≈1.9k deep level that program took
    359 s to compile and ~4 s per apply (round-4 L2_verify_s); the single
    (K, n) gather compiles in seconds and runs in milliseconds."""
    n = z.shape[0]
    idx = offs_arr[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    ok = (idx >= 0) & (idx < n)
    zg = jnp.take(z, jnp.clip(idx, 0, n - 1), axis=0) * ok.astype(z.dtype)
    return jnp.sum(vals * zg, axis=0)


@jax.jit
def _row_nnz(vals):
    """Per-diagonal nonzero counts — ONE readback serves both the zero-prune
    mask and the nnz total (two scalarized programs cost two remote
    compiles on axon)."""
    return jnp.sum(vals != 0, axis=1)


class _DenseCarrier:
    """Coarsest-level operator probed DENSE (one probe per coarse cell —
    no DIA extraction program): used when the next level is the final one
    (n_c ≤ coarse_enough-ish), where the extract scan over thousands of
    candidate offsets is the single slowest remote compile of the whole
    setup (observed wedging the axon compile helper >1 h at 4913
    candidates) and the operator is about to be densely inverted anyway."""

    def __init__(self, dense: np.ndarray):
        self._d = np.asarray(dense, dtype=np.float64)
        self.shape = self._d.shape
        self.nnz = int(np.count_nonzero(self._d))

    def diagonal(self) -> np.ndarray:
        return np.diag(self._d).copy()

    def toarray(self) -> np.ndarray:
        return self._d

    def tocsr(self) -> sp.csr_matrix:
        return sp.csr_matrix(self._d)


class _DiaCarrier:
    """Coarse-level operator held as device DIA between setup iterations —
    the fast structured path never materializes host CSR unless a fallback
    or the coarsest dense inverse needs it."""

    def __init__(self, offsets, vals, nnz: int):
        self.offsets = tuple(int(o) for o in offsets)
        self.vals = vals                       # (K, n) device
        self.nnz = int(nnz)
        n = int(vals.shape[1])
        self.shape = (n, n)

    def diagonal(self) -> np.ndarray:
        k0 = self.offsets.index(0)
        return np.asarray(self.vals[k0], dtype=np.float64)

    def to_dia_matrix(self, dtype) -> "DIAMatrix":
        from polysolve_tpu.types import DIAMatrix

        return DIAMatrix(vals=self.vals.astype(dtype), offsets=self.offsets,
                         shape=self.shape, nnz=self.nnz)

    def tocsr(self) -> sp.csr_matrix:
        n = self.shape[0]
        vals = np.asarray(self.vals, dtype=np.float64)
        rows, cols, data = [], [], []
        for k, off in enumerate(self.offsets):
            i0, i1 = max(0, -off), min(n, n - off)
            i = np.arange(i0, i1)
            rows.append(i)
            cols.append(i + off)
            data.append(vals[k, i0:i1])
        A = sp.csr_matrix((np.concatenate(data),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=self.shape)
        A.eliminate_zeros()
        return A

    def toarray(self) -> np.ndarray:
        return self.tocsr().toarray()


@dataclass
class _ProbePlan:
    """Per-level probe artifacts cached across factorizes of one sparsity
    pattern (the Newton-loop refactorize optimization, VERDICT r3 #1): the
    candidate set, chunk geometry, and — critically — the KEPT offset subset.
    Reusing ``kept`` keeps the coarse DIA shapes and the AMGState treedef
    identical across refactorizes, so the compiled cycle/solve executables
    are reused; re-verification still runs every time and a value-pattern
    change that invalidates the plan falls back to a fresh prune."""

    grid: tuple
    dense: bool = False
    offs_pad: Any = None      # (C_pad,) int32 candidate offsets, padded
    deltas_pad: Any = None    # (C_pad, d) int32 per-axis moves, padded
    n_chunks: int = 0         # probe chunks of B columns
    kept: Any = None          # indices into offs_pad kept last factorize
    B: int = _PROBE_B         # probe batch width (level-size dependent)


def _tacc(timings, tag, key, dt):
    """Accumulate a phase duration under both the aggregate and the
    per-level (tagged) key — refactorize attribution needs to know WHICH
    level's probing costs (VERDICT r3 #1: the 640 s wasn't attributed)."""
    if timings is None:
        return
    timings[key] = timings.get(key, 0.0) + dt
    if tag:
        timings[tag + key] = timings.get(tag + key, 0.0) + dt


def _verify_rel(yz, apply_dia, z) -> float:
    """rel error of the probed operator's action vs the composed response
    ``yz`` (computed inside the probe program — see _rap_probe_all)."""
    y_ref = np.asarray(yz, dtype=np.float64)
    y_probe = apply_dia(z)
    denom = max(float(np.linalg.norm(y_ref)), 1e-300)
    return float(np.linalg.norm(y_probe - y_ref)) / denom


def _probe_dense_rap(A_dev, Dinv_dev, w, grid, dtype,
                     logger: Optional[logging.Logger] = None,
                     timings: Optional[dict] = None, tag: str = ""):
    """Dense probing for the final (coarsest-to-be) level: Ac columns are
    the composed responses to the identity basis — one _rap_probe_all
    program with the identity class map (every class is its own column)."""
    import time as _time

    cg = tuple(g // 2 for g in grid)
    n_c = int(np.prod(cg))
    B = _pick_probe_b(A_dev, n_c)
    w_dev = jnp.asarray(w, dtype=dtype)
    iota = jnp.arange(n_c, dtype=jnp.int32)      # identity "class" map
    n_chunks = -(-n_c // B)
    z = np.random.default_rng(7).standard_normal(n_c)
    t0 = _time.perf_counter()
    Y, yz = _rap_probe_all(A_dev, Dinv_dev, w_dev, iota,
                           jnp.asarray(z, dtype=dtype), grid, n_chunks, B)
    Ac = np.asarray(Y[:n_c], dtype=np.float64).T   # responses are rows
    _tacc(timings, tag, "probe_extract_s", _time.perf_counter() - t0)
    t0 = _time.perf_counter()
    rel = _verify_rel(yz, lambda zz: Ac @ zz, z)
    _tacc(timings, tag, "verify_s", _time.perf_counter() - t0)
    tol = 1e-10 if dtype == jnp.float64 else 1e-4
    if rel > tol:
        if logger:
            logger.warning("dense RAP probe verification failed (rel %.2e)",
                           rel)
        return None
    return _DenseCarrier(0.5 * (Ac + Ac.T))      # symmetrize fp noise


def _probe_structured_rap(A_dev, Dinv_dev, w, grid, dtype,
                          logger: Optional[logging.Logger] = None,
                          plan: Optional[_ProbePlan] = None,
                          timings: Optional[dict] = None, tag: str = ""):
    """Compute Ac = PᵀAP for a structured level on device. Returns
    (_DiaCarrier, _ProbePlan), or (None, None) when verification fails
    (caller falls back to the host spgemm path). ``plan`` (from a previous
    factorize of the same pattern) skips the host-side candidate/geometry
    work and pins the kept-offset subset so all device shapes repeat."""
    import time as _time

    d = len(grid)
    cg = tuple(g // 2 for g in grid)
    n_c = int(np.prod(cg))
    r_ax = _axis_radii(A_dev.offsets, grid)
    # coarse stencil radius bound: P spans [−r_A, 1+r_A] around 2c per axis,
    # A couples r_A more ⇒ |2Δc| ≤ 3r_A + 2
    rc_ax = [min((3 * r + 2) // 2, c - 1) for r, c in zip(r_ax, cg)]
    s_ax = [min(2 * rc + 1, c) for rc, c in zip(rc_ax, cg)]
    n_cls = int(np.prod(s_ax))

    coords = np.unravel_index(np.arange(n_c), cg)
    cls = np.zeros(n_c, dtype=np.int64)
    for co, s in zip(coords, s_ax):
        cls = cls * s + (co % s)

    if n_cls > 8192:
        # a stencil wide enough to need >8k probe colors is not DIA-worthy
        # and the probe battery would exceed the host-spgemm cost
        if logger:
            logger.warning("structured RAP probe: %d probe colors exceed "
                           "the probe cap — host fallback", n_cls)
        return None, None

    t0 = _time.perf_counter()
    if plan is not None and not plan.dense and plan.grid == grid:
        offs_pad, deltas_pad = plan.offs_pad, plan.deltas_pad
        n_chunks, B = plan.n_chunks, plan.B
    else:
        plan = None
        # candidate offsets: the box of rc per axis, as linear coarse
        # offsets; the per-offset GEOMETRIC validity mask is computed on
        # device from the per-axis deltas (see _extract_dia)
        strides = [1] * d
        for ax in range(d - 2, -1, -1):
            strides[ax] = strides[ax + 1] * cg[ax + 1]
        axes = [np.arange(-rc, rc + 1) for rc in rc_ax]
        mesh = np.meshgrid(*axes, indexing="ij")
        deltas = np.stack([m.reshape(-1) for m in mesh], axis=1)   # (C, d)
        offs_cand = (deltas * np.asarray(strides)).sum(axis=1)
        order = np.argsort(offs_cand)
        offs_cand = offs_cand[order]
        deltas = deltas[order]
        # pad to fixed-size extract chunks; padding deltas are sent out of
        # range so their validity mask is all-false (extracted zeros), and
        # padding offsets use a large sentinel to keep the array sorted
        C = len(offs_cand)
        C_pad = -(-C // _EXTRACT_CHUNK) * _EXTRACT_CHUNK
        offs_pad = np.full(C_pad, np.iinfo(np.int32).max // 2, dtype=np.int32)
        offs_pad[:C] = offs_cand
        deltas_pad = np.full((C_pad, d), max(cg) + 1, dtype=np.int32)
        deltas_pad[:C] = deltas
        B = _pick_probe_b(A_dev, n_cls)
        n_chunks = -(-n_cls // B)
    host_s = _time.perf_counter() - t0

    w_dev = jnp.asarray(w, dtype=dtype)
    cls_dev = jnp.asarray(cls, dtype=jnp.int32)
    coords_dev = jnp.asarray(np.stack(coords), dtype=jnp.int32)  # (d, n_c)
    cg_dev = jnp.asarray(cg, dtype=jnp.int32)

    z = np.random.default_rng(7).standard_normal(n_c)
    t0 = _time.perf_counter()
    # every probe response in ONE device call (chunks map inside the jit)
    Y, yz = _rap_probe_all(A_dev, Dinv_dev, w_dev, cls_dev,
                           jnp.asarray(z, dtype=dtype), grid, n_chunks, B)
    # fixed-shape extract chunks (all levels share one program per Y shape)
    parts = [
        _extract_dia(Y, cls_dev,
                     jnp.asarray(offs_pad[c0:c0 + _EXTRACT_CHUNK]),
                     jnp.asarray(deltas_pad[c0:c0 + _EXTRACT_CHUNK]),
                     coords_dev, cg_dev)
        for c0 in range(0, len(offs_pad), _EXTRACT_CHUNK)
    ]
    vals = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    # one readback serves the zero-prune mask AND the nnz total
    counts = np.asarray(_row_nnz(vals))
    probe_s = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    if plan is not None and plan.kept is not None:
        keep = plan.kept
        fresh_keep = np.flatnonzero(counts > 0)
        if not np.isin(fresh_keep, keep).all():
            # value changes grew the stencil beyond last factorize's kept
            # set (possible after cancellation): fall back to a fresh prune
            plan = None
    reused_plan = plan is not None and plan.kept is not None
    if not reused_plan:
        keep = np.flatnonzero(counts > 0)
        if 0 not in offs_pad[keep]:                   # diagonal must exist
            keep = np.sort(np.append(keep, int(np.searchsorted(offs_pad, 0))))
    offs_kept = offs_pad[keep]
    vals_kept = jnp.take(vals, jnp.asarray(keep), axis=0)
    nnz_count = int(counts[keep].sum())

    # verification: probed DIA must reproduce the composed operator.
    # Skipped on a reused plan (refactorize): the extraction masks are
    # purely GEOMETRIC (value-independent, proven at setup for this
    # pattern), and the kept-set growth check above already catches the
    # only value-dependent hazard (cancellation-grown stencils) — the
    # re-verify cost 1.14 s of every 7.08M refactorize (VERDICT r4 #4).
    if reused_plan:
        rel = 0.0
    else:
        from polysolve_tpu.types import DIAMatrix

        Ac = DIAMatrix(vals=vals_kept,
                       offsets=tuple(int(o) for o in offs_kept),
                       shape=(n_c, n_c), nnz=max(nnz_count, 1))
        rel = _verify_rel(
            yz,
            lambda zz: np.asarray(
                _dia_action(vals_kept, jnp.asarray(offs_kept, jnp.int32),
                            jnp.asarray(zz, dtype=dtype)),
                dtype=np.float64), z)
    verify_s = _time.perf_counter() - t0
    _tacc(timings, tag, "probe_extract_s", probe_s)
    _tacc(timings, tag, "verify_s", verify_s)
    _tacc(timings, tag, "probe_host_s", host_s)
    tol = 1e-10 if dtype == jnp.float64 else 1e-4
    if rel > tol:
        if logger:
            logger.warning(
                "structured RAP probe verification failed (rel %.2e) — "
                "falling back to host spgemm", rel)
        return None, None
    new_plan = _ProbePlan(grid=grid, dense=False, offs_pad=offs_pad,
                          deltas_pad=deltas_pad, n_chunks=n_chunks,
                          kept=np.asarray(keep), B=B)
    return _DiaCarrier(offs_kept, vals_kept, nnz_count), new_plan


def _p_apply(lev: AMGLevel, zc: jnp.ndarray) -> jnp.ndarray:
    """P·zc. Structured: (I − ωD⁻¹A)·T·zc (one DIA matvec, no gather)."""
    if lev.grid is not None:
        t = _t_apply(lev.grid, zc)
        return t - lev.w_smooth * (lev.Dinv * ops.matvec(lev.A, t))
    return ops.matvec(lev.P, zc)


def _r_apply(lev: AMGLevel, y: jnp.ndarray) -> jnp.ndarray:
    """R·y = Pᵀ·y. Structured: Tᵀ·(y − ω·A·(D⁻¹y))."""
    if lev.grid is not None:
        return _tT_apply(lev.grid, y - lev.w_smooth * ops.matvec(lev.A, lev.Dinv * y))
    return ops.matvec(lev.R, y)


def cycle(state: AMGState, r: jnp.ndarray, start: int = 0) -> jnp.ndarray:
    """One multigrid cycle applied to residual r (zero initial guess) —
    usable directly as a CG preconditioner (symmetric V-cycle).
    ``start`` begins the recursion at a coarser level (profiling and
    truncated-cycle uses; r must then be a level-``start`` vector)."""

    def level_solve(l: int, rl: jnp.ndarray) -> jnp.ndarray:
        if l == len(state.levels):
            return jnp.dot(state.coarse_inv, rl,
                           preferred_element_type=rl.dtype,
                           precision=jax.lax.Precision.HIGHEST)
        lev = state.levels[l]
        z = _smooth(lev, rl)
        resid = rl - ops.matvec(lev.A, z)
        rc = _r_apply(lev, resid)
        zc = level_solve(l + 1, rc)
        if l + 1 < len(state.levels):  # coarsest solve is exact: extra cycles no-op
            for _ in range(state.ncycle - 1):  # ncycle=2 → W-cycle (AMGCL ncycle)
                rc2 = rc - ops.matvec(state.levels[l + 1].A, zc)
                zc = zc + level_solve(l + 1, rc2)
        z = z + _p_apply(lev, zc)
        z = z + _smooth(lev, rl - ops.matvec(lev.A, z))
        return z

    return level_solve(start, r)


def apply_preconditioner(state: AMGState, r: jnp.ndarray) -> jnp.ndarray:
    """``pre_cycles`` AMG iterations on residual r (zero initial guess) —
    the preconditioner application. pre_cycles > 1 chains cycles through
    residual correction (the Hypre ``pre_max_iter`` semantics,
    HypreSolver.cpp:186-189). Symmetric for even/odd counts since each
    cycle is itself a symmetric operator."""
    z = cycle(state, r)
    if state.levels:
        for _ in range(state.pre_cycles - 1):
            z = z + cycle(state, r - ops.matvec(state.levels[0].A, z))
    return z


# --------------------------------------------------------------------------- #
# Host setup                                                                  #
# --------------------------------------------------------------------------- #


@dataclass
class AMGHierarchy:
    state: AMGState
    level_sizes: list
    operator_complexity: float
    aggregates: list = None  # per-level aggregation maps (pattern-reuse cache)
    probe_plans: list = None  # per-level _ProbePlan (device-RAP reuse cache)
    timings: dict = None      # setup phase attribution (seconds)
    device_caches: list = None  # per-level tile-ELL value-scatter plans

    @staticmethod
    def setup(A: sp.spmatrix, params: Dict[str, Any] = None, block_size: int = 1,
              nullspace: Optional[np.ndarray] = None,
              logger: Optional[logging.Logger] = None,
              reuse_aggregates: Optional[list] = None,
              reuse_probe: Optional[list] = None,
              reuse_device: Optional[list] = None) -> "AMGHierarchy":
        """Build the hierarchy. ``reuse_aggregates`` (from a previous
        hierarchy on the same sparsity pattern) skips the aggregation phase,
        and ``reuse_probe`` (its probe-plan companion) pins the device-probed
        RAP geometry so every probe/extract/cycle executable is reused —
        the Newton-loop refactorization optimization: the reference rebuilds
        AMGCL's hierarchy from scratch every factorize (AMGCL.cpp:148-184);
        we re-coarsen only values (SURVEY.md §7 hard-part #2)."""
        import time as _time

        _t_setup0 = _time.perf_counter()
        params = params or {}
        max_levels = int(params.get("max_levels", 6))
        coarse_enough = int(params.get("coarse_enough", 500))
        eps_strong = float(params.get("eps_strong", 0.08))
        degree = int(params.get("relax_degree", 3))
        ncycle = int(params.get("ncycle", 1))
        omega = float(params.get("omega", 4.0 / 3.0))
        smoother = str(params.get("smoother", "cheb4"))
        # cheb1 spectrum brackets as fractions of the estimated ρ
        # (AMGCL relax.lower/higher, reference AMGCL.cpp:36-43)
        cheb_lower = float(params.get("cheb_lower", 1.0 / 30.0))
        cheb_higher = float(params.get("cheb_higher", 1.1))
        dtype = default_dtype()

        A0 = sp.csr_matrix(A).astype(np.float64)
        n = A0.shape[0]
        B = _initial_nullspace(n, block_size, nullspace)

        # structured (gather-free) transfers when the pattern is a grid
        # stencil and the problem is scalar (params["grid"] overrides)
        grid = None
        if block_size == 1 and nullspace is None and \
                bool(params.get("structured", True)):
            grid = params.get("grid")
            grid = tuple(grid) if grid else _detect_grid(A0)

        levels = []
        sizes = [n]
        aggregates = []
        probe_plans = []
        device_caches = []
        timings: Dict[str, float] = {}
        # planar-tile block layout of the CURRENT level's device vector
        # space (facade-injected for level 0; propagated to uniform-block
        # coarse levels below — the 63k coarse level's scalar tile matvec
        # ran at ~5 Gnnz/s window-span-bound and dominated the cycle)
        planar_cur = params.get("_planar")
        total_nnz = A0.nnz
        Al, Bl = A0, B
        blk = max(int(block_size), 1)  # current level's block width
        while Al.shape[0] > coarse_enough and len(levels) < max_levels - 1:
            if isinstance(Al, _DenseCarrier):
                # rare: a dense-probed level that still isn't coarse enough
                Al = Al.tocsr()
            structured = (grid is not None and all(g % 2 == 0 for g in grid)
                          and int(np.prod(grid)) == Al.shape[0])

            # ---- fast structured path: device-probed Galerkin RAP ----
            # (no host P/R/spgemm at all; the level and its coarse operator
            # live as DIA on device — see _probe_structured_rap).
            # "auto" probes only on TPU: on CPU the probe matvecs run on the
            # same 2 host cores as spgemm and are slower, not faster.
            rap_mode = str(params.get("rap", "auto"))
            use_probe = rap_mode == "device" or (
                rap_mode == "auto" and jax.default_backend() == "tpu")
            if structured and use_probe:
                from polysolve_tpu.types import DIAMatrix as _DIA

                t0 = _time.perf_counter()
                if isinstance(Al, _DiaCarrier):
                    A_dev = Al.to_dia_matrix(dtype)
                    d = Al.diagonal()
                elif (len(levels) == 0
                        and isinstance(params.get("_level0_dev"), _DIA)
                        and params["_level0_dev"].shape == Al.shape
                        and params["_level0_dev"].dtype == dtype):
                    # facade-injected fine operator: the facade already
                    # converted+uploaded this exact matrix (facade_convert);
                    # re-running to_device_matrix here duplicated the host
                    # DIA extraction AND a second ~200 MB tunnel upload per
                    # refactorize at 7.08M (it hid in setup_untimed_s and
                    # the L0_power readback tail — VERDICT r4 #4)
                    A_dev = params["_level0_dev"]
                    d = Al.diagonal()
                else:
                    dia_cap = (min(2048, max(64, (256 << 20)
                                             // (4 * Al.shape[0])))
                               if len(levels) > 0 else 64)
                    cand = ops.to_device_matrix(
                        Al, dtype=dtype, dia_max_diags=dia_cap,
                        dia_fill_threshold=0.02 if len(levels) > 0 else 0.55)
                    A_dev = cand if isinstance(cand, _DIA) else None
                    d = Al.diagonal() if A_dev is not None else None
                _tacc(timings, f"L{len(levels)}_", "convert_s",
                      _time.perf_counter() - t0)
                carrier = None
                plan = None
                prev_plan = (reuse_probe[len(levels)]
                             if reuse_probe is not None
                             and len(levels) < len(reuse_probe) else None)
                if A_dev is not None:
                    tag = f"L{len(levels)}_"
                    t0 = _time.perf_counter()
                    d = np.where(d != 0, d, 1.0)
                    Dinv_dev = jnp.asarray(1.0 / d, dtype=dtype)
                    v0 = _power_v0(A_dev.shape[0], jnp.dtype(dtype).name)
                    _tacc(timings, tag, "level_prep_s",
                          _time.perf_counter() - t0)
                    t0 = _time.perf_counter()
                    # refactorize (plan reuse): the spectrum moves slowly
                    # between Newton steps and cheb4 needs only an upper
                    # bound — 6 iterations with a 5% safety margin replace
                    # the full 20 (L0 power was 2.8 s of the warm
                    # refactorize at n=7.08M)
                    p_iters = int(params.get("power_iters", 20))
                    if prev_plan is not None:
                        p_iters = min(p_iters, 6)
                    rho_da = max(float(_power_iter_dia(
                        A_dev, Dinv_dev, v0, iters=p_iters)), 1e-12)
                    if prev_plan is not None:
                        rho_da *= 1.05
                    _tacc(timings, tag, "power_s", _time.perf_counter() - t0)
                    w_used = omega / rho_da
                    n_c_next = int(np.prod([g // 2 for g in grid]))
                    if n_c_next <= max(coarse_enough, 2048):
                        # final level: dense probing (no DIA-extract scan —
                        # the operator is about to be densely inverted
                        # anyway, see _DenseCarrier)
                        carrier = _probe_dense_rap(
                            A_dev, Dinv_dev, w_used, grid, dtype, logger,
                            timings=timings, tag=tag)
                        plan = _ProbePlan(grid=grid, dense=True)
                    else:
                        carrier, plan = _probe_structured_rap(
                            A_dev, Dinv_dev, w_used, grid, dtype, logger,
                            plan=prev_plan, timings=timings, tag=tag)
                if carrier is not None:
                    aggregates.append((None, carrier.shape[0]))
                    probe_plans.append(plan)
                    device_caches.append(None)
                    if smoother == "cheb1":
                        lo, hi = cheb_lower * rho_da, cheb_higher * rho_da
                    else:
                        lo, hi = 1.0, 1.0
                    levels.append(AMGLevel(
                        A=A_dev, P=None, R=None,
                        theta=jnp.asarray((hi + lo) / 2.0, dtype=dtype),
                        delta=jnp.asarray((hi - lo) / 2.0, dtype=dtype),
                        Dinv=Dinv_dev,
                        w_smooth=jnp.asarray(w_used, dtype=dtype),
                        rho_da=jnp.asarray(1.02 * rho_da, dtype=dtype),
                        degree=degree, smoother=smoother, grid=grid,
                    ))
                    Al = carrier
                    Bl = np.ones((carrier.shape[0], 1))
                    sizes.append(carrier.shape[0])
                    total_nnz += carrier.nnz
                    grid = tuple(g // 2 for g in grid)
                    continue
                # probe unavailable/failed → general host path below

            if isinstance(Al, _DiaCarrier):
                Al = Al.tocsr()
            # ratio mode: eps halves per level (AMGCL's smoothed_aggregation
            # rule) — coarse Galerkin stencils have relatively weaker
            # couplings, a fixed threshold degenerates to singleton
            # aggregates. rowmax mode is self-normalizing per row: keep eps.
            strength_mode = str(params.get("strength", "ratio"))
            eps_l = (eps_strong * (0.5 ** len(levels))
                     if strength_mode == "ratio" else eps_strong)
            if structured:
                agg = _box_aggregate(grid)
                n_agg = int(np.prod([g // 2 for g in grid]))
            elif reuse_aggregates is not None and len(levels) < len(reuse_aggregates):
                agg, n_agg = reuse_aggregates[len(levels)]
            else:
                # blk-wide block aggregation at EVERY level — coarse levels
                # of a block system keep an exact k-wide block structure
                # (k nullspace columns per aggregate); scalar aggregation on
                # them degenerates (round-4 stall: 85,905→13,848→7,490→
                # 6,944→6,863 at 1M-row elasticity)
                agg, n_agg = _aggregate(Al, eps_l, blk, mode=strength_mode)
            # coarse size is n_agg·k (k nullspace columns per aggregate) —
            # compare in DOF units or block hierarchies never trip the guard
            if n_agg * Bl.shape[1] > 0.8 * Al.shape[0]:
                # degenerate coarsening (mostly singleton aggregates): stop
                # the hierarchy here rather than stacking dead levels — the
                # 1M-row block-3 elasticity run produced 7490→6944→6863
                # tail levels that cost cycle time and helped nothing.
                # ONLY break when the level is small enough to densely
                # invert (ADVICE r4 medium: breaking at a large Al would
                # fall through to an O(n²) coarse_inv densification/OOM);
                # otherwise accept slow-but-real progress, and raise on
                # true no-progress stalls instead of densifying.
                if Al.shape[0] <= max(4 * coarse_enough,
                                      int(params.get("dense_level", 4096))):
                    break
                if n_agg >= Al.shape[0]:
                    raise RuntimeError(
                        f"AMG coarsening stalled at n={Al.shape[0]} "
                        f"(n_agg={n_agg}): the strength graph is empty at "
                        "this level. Lower eps_strong or pass a nullspace/"
                        "block_size matching the PDE system.")
            aggregates.append((agg, n_agg))
            probe_plans.append(None)
            # per-level device-op value-plan cache (A/P/R tile-ELL): reuse
            # the previous factorize's plans when the pattern repeats
            dc = (reuse_device[len(device_caches)]
                  if reuse_device is not None
                  and len(device_caches) < len(reuse_device)
                  and reuse_device[len(device_caches)] is not None
                  else {"A": {}, "P": {}, "R": {}})
            device_caches.append(dc)
            t_host0 = _time.perf_counter()
            d = Al.diagonal()
            d = np.where(d != 0, d, 1.0)
            # D⁻¹A built once per level by direct CSR row scaling (a diag
            # matmul copies the matrix twice per level), shared by the
            # spectral-radius estimate, the smoothed prolongator, and the
            # 4th-kind smoother bound
            DA = Al.copy()
            DA.data = DA.data / np.repeat(d, np.diff(Al.indptr))
            rho_da = _spectral_radius_host(DA)
            P_tent, Bc, uniform = _tentative_prolongator(agg, n_agg, Bl)
            if structured:
                P, w_used = _smooth_prolongator(Al, P_tent, omega,
                                                rho_da=rho_da, DA=DA)
            elif not bool(params.get("smooth_P", True)):
                # plain (unsmoothed) aggregation: P = P_tent — more robust
                # on strongly heterogeneous operators (AMGCL's aggregation
                # coarsening choice)
                P, w_used = sp.csr_matrix(P_tent), 0.0
            elif bool(params.get("filter_smooth", True)):
                # smooth through the strength-FILTERED operator: weak
                # couplings lumped onto the (block-)diagonal. Unfiltered
                # smoothing densifies coarse stencils until every pair is
                # weak relative to the diagonal → the coarsening stall.
                Af = _filtered_matrix(Al, eps_l, blk, mode=strength_mode)
                df = Af.diagonal()
                df = np.where(df != 0, df, 1.0)
                DAf = Af.copy()
                DAf.data = DAf.data / np.repeat(df, np.diff(Af.indptr))
                rho_f = _spectral_radius_host(DAf)
                P, w_used = _smooth_prolongator(Al, P_tent, omega,
                                                rho_da=rho_f, DA=DAf)
            else:
                P, w_used = _smooth_prolongator(Al, P_tent, omega,
                                                rho_da=rho_da, DA=DA)
            # coarse block width for the next level's aggregation: exact
            # k-wide blocks iff every aggregate kept all k columns
            blk = Bc.shape[1] if (uniform and not structured) else 1
            R = native.csr_transpose(P)
            if R is None:
                R = sp.csr_matrix(P.T)
            # Galerkin RAP via the native threaded SpGEMM (scipy's
            # csr_matmat is single-threaded two-pass and dominated setup)
            AP = native.spgemm(Al, P)
            Ac = native.spgemm(R, AP) if AP is not None else None
            if Ac is None:
                Ac = sp.csr_matrix(R @ Al @ P)
            Ac.eliminate_zeros()
            timings["host_spgemm_s"] = timings.get("host_spgemm_s", 0.0) \
                + _time.perf_counter() - t_host0
            t_conv0 = _time.perf_counter()

            # coarse stencils carry more diagonals; ON TPU, DIA stays
            # worthwhile far below the generic fill threshold because the
            # alternative is an XLA gather (0.13 Gnnz/s measured). The
            # per-level diag cap is a byte budget (DIA stores/streams
            # K·n·4 B per matvec regardless of fill), so deep structured
            # levels with K~700 stay DIA. On CPU the loose thresholds are
            # pathological — a K=1241 DIA at n=1754 unrolls 1241 shifted
            # FMAs per matvec (measured 280 ms/CG-iteration on the A0
            # fixture's blocks) — so keep the generic 64/0.55 rule there.
            # PLANAR block path: a level whose vector space is planar-tile
            # (facade-injected level 0, or a propagated uniform-block
            # coarse level) runs the BLOCK tile-ELL operator; P's
            # rows/cols, R's rows/cols and Dinv are re-indexed into the
            # fine/coarse planar slots so the whole cycle speaks planar
            # with no per-apply relayout.
            planar = planar_cur if not structured else None
            # does the COARSE level (P's column space) go planar too?
            on_tpu_lvl = jax.default_backend() == "tpu"
            tile_on = (params.get("tile_ell") in (True, "on")
                       or (on_tpu_lvl
                           and params.get("tile_ell") not in (False, "off")))
            nc = P.shape[1]
            planar_next = None
            if (not structured and tile_on and blk in (2, 3, 4)
                    and str(params.get("tile_ell_block", "auto"))
                    not in ("off", "False")
                    and nc % blk == 0
                    and nc > max(int(params.get("dense_level", 4096)),
                                 coarse_enough)):
                dofs_c = np.arange(nc)
                Ic, compc = dofs_c // blk, dofs_c % blk
                inv_c = ((Ic // 128) * (blk * 128) + compc * 128
                         + (Ic % 128)).astype(np.int64)
                planar_next = {"inv": inv_c,
                               "n_pad": (-(-(nc // blk) // 128)) * 128 * blk,
                               "blk": blk}
            P_host, R_host, Dinv_host = P, R, 1.0 / d
            if planar is not None or planar_next is not None:
                Pc = sp.coo_matrix(P)
                prow = planar["inv"][Pc.row] if planar else Pc.row
                pcol = (planar_next["inv"][Pc.col] if planar_next
                        else Pc.col)
                pshape = (planar["n_pad"] if planar else P.shape[0],
                          planar_next["n_pad"] if planar_next
                          else P.shape[1])
                P_host = sp.csr_matrix((Pc.data, (prow, pcol)),
                                       shape=pshape)
                Rc = sp.coo_matrix(R)
                rrow = (planar_next["inv"][Rc.row] if planar_next
                        else Rc.row)
                rcol = planar["inv"][Rc.col] if planar else Rc.col
                R_host = sp.csr_matrix((Rc.data, (rrow, rcol)),
                                       shape=(pshape[1], pshape[0]))
            if planar is not None:
                Dinv_host = np.ones(planar["n_pad"])
                Dinv_host[planar["inv"]] = 1.0 / d
                if "level0_op" in planar:
                    A_dev = planar["level0_op"]
                else:
                    A_dev = _maybe_block_tile(Al, planar, dtype,
                                              cache=dc["A"])
            else:
                on_tpu_lvl = jax.default_backend() == "tpu"
                dia_cap = (min(2048,
                               max(64, (256 << 20) // (4 * Al.shape[0])))
                           if len(levels) > 0 and on_tpu_lvl else 64)
                A_dev = ops.to_device_matrix(
                    Al, dtype=dtype,
                    dia_max_diags=dia_cap,
                    dia_fill_threshold=(0.02
                                        if len(levels) > 0 and on_tpu_lvl
                                        else 0.55),
                )
                from polysolve_tpu.types import DIAMatrix as _DIAm
                from polysolve_tpu.types import ELLMatrix as _ELL
                from polysolve_tpu.types import dense_from_scipy

                # near-dense DIA levels (K ≳ n/3) are better as ONE dense
                # MXU matvec: comparable bytes, none of the K-term unroll
                wide_dia = (isinstance(A_dev, _DIAm)
                            and 3 * len(A_dev.offsets) >= Al.shape[0])
                if (isinstance(A_dev, _ELL) or wide_dia) and \
                        params.get("tile_ell") not in (True, "on") and \
                        Al.shape[0] <= int(params.get("dense_level", 4096)):
                    # a level that would run the ELL/XLA-gather path goes
                    # DENSE instead: one MXU matvec. The gather was measured
                    # at 24.5 ms/matvec at n=4096
                    # (amg_cycle_profile_results.jsonl) — visited 8x per
                    # W-cycle it dominated the preconditioner. NOTE dense is
                    # O(n²) memory: 64 MB fp32 at the 4096 default cap, per
                    # qualifying level — raise ``dense_level`` with care
                    A_dev = dense_from_scipy(Al, dtype=dtype)
                else:
                    # anything still ELL runs tile-ELL on TPU (threshold
                    # 4096 — no dead zone between dense cap and tile path)
                    A_dev = _maybe_tile(A_dev, Al, params, dtype,
                                        fast_reduce=True, cache=dc["A"])
            if smoother == "cheb1":
                # brackets on the Jacobi-scaled spectrum (AMGCL scale: true)
                lo, hi = cheb_lower * rho_da, cheb_higher * rho_da
            else:
                lo, hi = 1.0, 1.0  # unused by cheb4
            levels.append(AMGLevel(
                A=A_dev,
                P=None if structured else _maybe_tile(
                    None, P_host, params, dtype,
                    fast_reduce=True, cache=dc["P"]),
                R=None if structured else _maybe_tile(
                    None, R_host, params, dtype,
                    fast_reduce=True, cache=dc["R"]),
                theta=jnp.asarray((hi + lo) / 2.0, dtype=dtype),
                delta=jnp.asarray((hi - lo) / 2.0, dtype=dtype),
                Dinv=jnp.asarray(Dinv_host, dtype=dtype),
                w_smooth=jnp.asarray(w_used, dtype=dtype) if structured else None,
                rho_da=jnp.asarray(1.02 * rho_da, dtype=dtype),
                degree=degree,
                smoother=smoother,
                grid=grid if structured else None,
            ))
            timings["convert_s"] = timings.get("convert_s", 0.0) \
                + _time.perf_counter() - t_conv0
            Al, Bl = Ac, Bc
            sizes.append(Al.shape[0])
            total_nnz += Al.nnz
            grid = tuple(g // 2 for g in grid) if structured else None
            planar_cur = None if structured else planar_next

        t0 = _time.perf_counter()
        Ac_dense = Al.toarray() if not isinstance(Al, np.ndarray) else Al
        if planar_cur is not None:
            # the hierarchy ended on a level whose vector space is planar
            # (max_levels exhausted before the dense threshold): the dense
            # coarse solve must live in the same slots — permute + pad
            # with identity rows
            inv = planar_cur["inv"]
            n_pad = planar_cur["n_pad"]
            Ad = np.eye(n_pad, dtype=Ac_dense.dtype)
            Ad[np.ix_(inv, inv)] = Ac_dense
            Ac_dense = Ad
        state = AMGState(levels=tuple(levels),
                         coarse_inv=_dense_inv(Ac_dense, dtype),
                         ncycle=max(ncycle, 1),
                         pre_cycles=max(int(params.get("pre_max_iter", 1)), 1))
        timings["coarse_inv_s"] = _time.perf_counter() - t0
        # catch-all: wall − Σ top-level phases = aggregation/strength/
        # carrier-packing/state-build time not covered by a named timer
        # (VERDICT r4 #4: the refactorize budget must be fully attributed)
        wall = _time.perf_counter() - _t_setup0
        named = sum(v for k, v in timings.items()
                    if not k.startswith("L") and k.endswith("_s"))
        timings["setup_wall_s"] = wall
        timings["setup_untimed_s"] = wall - named
        if logger:
            logger.debug("AMG hierarchy: sizes=%s complexity=%.2f timings=%s",
                         sizes, total_nnz / max(A0.nnz, 1),
                         {k: round(v, 2) for k, v in timings.items()})
        return AMGHierarchy(state=state, level_sizes=sizes,
                            operator_complexity=total_nnz / max(A0.nnz, 1),
                            aggregates=aggregates, probe_plans=probe_plans,
                            timings=timings, device_caches=device_caches)


def _maybe_block_tile(Al, planar: dict, dtype,
                      cache: Optional[dict] = None):
    """Block tile-ELL for a PLANARIZED hierarchy level: pad with identity
    dummy nodes to the planar slot count, pack b×b node blocks (value-plan
    cached for refactorize), fast single-pass reduce (preconditioner-
    internal accuracy class)."""
    from polysolve_tpu.ops import tile_ell

    blk = planar["blk"]
    n_pad = planar["n_pad"]
    pad = n_pad - Al.shape[0]
    A_pad = (sp.block_diag([sp.csr_matrix(Al),
                            sp.identity(pad, format="csr")], format="csr")
             if pad else sp.csr_matrix(Al))
    A_pad.sum_duplicates()
    A_pad.sort_indices()
    if cache is not None:
        key = (A_pad.shape, A_pad.nnz,
               hash(A_pad.indptr.tobytes())
               ^ hash(A_pad.indices.tobytes()))
        if cache.get("bkey") == key:
            M = tile_ell.repack_block_values(
                cache["bM"], *cache["bmaps"], A_pad.data)
            cache["bM"] = M
            return M.with_fast_reduce()
        M, plan, bof, boffs = tile_ell.pack_block(A_pad, blk, dtype=dtype)
        cache.update({"bkey": key, "bM": M, "bmaps": (plan, bof, boffs)})
        return M.with_fast_reduce()
    M, _, _, _ = tile_ell.pack_block(A_pad, blk, dtype=dtype)
    return M.with_fast_reduce()


def _maybe_tile(dev, A_host, params, dtype, fast_reduce: bool = False,
                cache: Optional[dict] = None):
    """Swap an ELL device operator for the Pallas tile-ELL format on TPU:
    unstructured levels/transfers otherwise run the 0.13 Gnnz/s XLA gather.
    Assumes the caller ordered the fine problem for banded locality
    (AMGSolver RCM-permutes before setup); aggregation preserves it, so
    coarse operators and P/R inherit usable windows."""
    import jax

    from polysolve_tpu.types import ELLMatrix

    mode = (params or {}).get("tile_ell", "auto")
    # dev=None means "ELL candidate not built yet" (transfer operators):
    # the ELL is only materialized when the tile path does NOT engage —
    # otherwise pack directly from the host CSR (no throwaway ELL build)
    is_cand = dev is None or isinstance(dev, ELLMatrix)
    if mode in (False, "off") or not is_cand:
        return dev if dev is not None else ell_from_scipy(A_host, dtype=dtype)
    on_tpu = jax.default_backend() == "tpu"
    if mode in (True, "on") or (on_tpu and A_host.shape[0] >= 4096):
        from polysolve_tpu.ops import tile_ell

        if cache is not None:
            # value-only refill when the level's sparsity pattern is
            # unchanged since the last factorize (refactorize economics:
            # the round-4 unstructured path re-packed every level, 280 s
            # at 1M rows)
            Ac = sp.csr_matrix(A_host)
            Ac.sum_duplicates()
            Ac.sort_indices()
            key = (Ac.shape, Ac.nnz,
                   hash(Ac.indptr.tobytes()) ^ hash(Ac.indices.tobytes()))
            if cache.get("key") == key:
                M = tile_ell.repack_values(cache["M"], cache["plan"],
                                           Ac.data)
                cache["M"] = M
                return M.with_fast_reduce() if fast_reduce else M
            M, plan = tile_ell.pack_with_plan(Ac, dtype=dtype)
            cache.update({"key": key, "M": M, "plan": plan})
        else:
            M = tile_ell.pack(A_host, dtype=dtype)
        # preconditioner-internal operators use the single-pass bf16 reduce
        # (1.4e-3/matvec) — AMG smoother/transfer applications are O(1e-1)
        # approximations; the solver-level operator (the facade's A_dev,
        # fast_reduce=False) keeps the accurate two-pass split
        return M.with_fast_reduce() if fast_reduce else M
    return dev if dev is not None else ell_from_scipy(A_host, dtype=dtype)


def _initial_nullspace(n: int, block_size: int, nullspace) -> np.ndarray:
    if nullspace is not None and np.asarray(nullspace).size:
        B = np.asarray(nullspace, dtype=np.float64)
        return B.reshape(n, -1)
    if block_size > 1:
        # one constant vector per dof component (AMGCL block behavior)
        B = np.zeros((n, block_size))
        for c in range(block_size):
            B[c::block_size, c] = 1.0
        return B
    return np.ones((n, 1))


def _strength_graph(A: sp.csr_matrix, eps: float) -> sp.csr_matrix:
    """Symmetric strength of connection: keep |a_ij| ≥ eps·√(a_ii·a_jj)."""
    d = np.abs(A.diagonal())
    d = np.where(d > 0, d, 1.0)
    C = sp.coo_matrix(A)
    mask = C.row != C.col
    strong = np.abs(C.data) >= eps * np.sqrt(d[C.row] * d[C.col])
    keep = mask & strong
    S = sp.csr_matrix(
        (np.abs(C.data[keep]), (C.row[keep], C.col[keep])), shape=A.shape
    )
    return S.maximum(S.T)  # symmetrize


def _filtered_matrix(A: sp.csr_matrix, eps: float,
                     block_size: int = 1,
                     mode: str = "ratio") -> sp.csr_matrix:
    """Vaněk strength-filtered matrix for prolongator smoothing: weak
    off-(block-)diagonal entries are dropped and lumped onto the (block)
    diagonal, preserving the operator's action on per-component constant
    vectors (A_f·1_c = A·1_c). Smoothing P_tent with the UNfiltered D⁻¹A
    spreads the prolongator across weak couplings — coarse stencils densify,
    every node pair turns weak relative to the grown diagonal, and
    aggregation stalls (the round-4 block-3 elasticity failure). AMGCL
    applies the same filter before smoothing (smoothed_aggregation's
    eps_strong filtering; reference wrapper AMGCL.cpp:106-128)."""
    n = A.shape[0]
    C = sp.coo_matrix(A)
    bs = block_size
    if bs > 1:
        nb = n // bs
        br = (C.row // bs).astype(np.int64)
        bc = (C.col // bs).astype(np.int64)
        An = sp.csr_matrix((np.abs(C.data), (br, bc)), shape=(nb, nb))
        Anc = An.tocoo()  # canonical → (row, col)-sorted keys
        noff = Anc.row != Anc.col
        if mode == "rowmax":
            M = sp.csr_matrix((Anc.data[noff],
                               (Anc.row[noff], Anc.col[noff])),
                              shape=(nb, nb))
            rm = np.asarray(M.max(axis=1).todense()).ravel()
            strong_flag = noff & (Anc.data >= eps * np.maximum(
                np.minimum(rm[Anc.row], rm[Anc.col]), 1e-300))
        else:
            dn = An.diagonal()
            dn = np.where(dn > 0, dn, 1.0)
            strong_flag = noff & (
                Anc.data >= eps * np.sqrt(dn[Anc.row] * dn[Anc.col]))
        keys = Anc.row.astype(np.int64) * nb + Anc.col
        idx = np.searchsorted(keys, br * nb + bc)
        keep = strong_flag[idx] | (br == bc)
    else:
        absd = np.abs(C.data)
        if mode == "rowmax":
            off = C.row != C.col
            M = sp.csr_matrix((absd[off], (C.row[off], C.col[off])),
                              shape=A.shape)
            rm = np.asarray(M.max(axis=1).todense()).ravel()
            keep = (C.row == C.col) | (absd >= eps * np.maximum(
                np.minimum(rm[C.row], rm[C.col]), 1e-300))
        else:
            d = np.abs(A.diagonal())
            d = np.where(d > 0, d, 1.0)
            keep = (C.row == C.col) | (
                absd >= eps * np.sqrt(d[C.row] * d[C.col]))
    # lump dropped entries onto the (block-)diagonal: entry (i, j) moves to
    # column block_of(i)*bs + (j % bs) — for bs=1 simply to (i, i)
    new_col = np.where(keep, C.col,
                       (C.row // bs) * bs + (C.col % bs))
    Af = sp.csr_matrix((C.data, (C.row, new_col)), shape=A.shape)
    Af.sum_duplicates()
    return Af


def _row_max(S: sp.csr_matrix, values: np.ndarray, empty: float) -> np.ndarray:
    """out[i] = max over S-neighbors j of values[j] (empty rows → ``empty``)."""
    n = S.shape[0]
    out = np.full(n, empty)
    deg = np.diff(S.indptr)
    nz_rows = deg > 0
    if S.nnz:
        maxes = np.maximum.reduceat(values[S.indices], S.indptr[:-1][nz_rows])
        out[nz_rows] = maxes
    return out


def _rowmax_strength(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Row-max-relative strength (classical RS-style): keep |a_ij| ≥
    θ·max_k≠i|a_ik|, symmetrized by OR. Self-normalizing per row — immune to
    the diagonal-growth stall that empties the Vaněk √(a_ii·a_jj) test on
    strongly heterogeneous coarse operators (every non-isolated node keeps
    its strongest neighbor)."""
    C = sp.coo_matrix(A)
    off = C.row != C.col
    M = sp.csr_matrix((np.abs(C.data[off]), (C.row[off], C.col[off])),
                      shape=A.shape)
    rowmax = np.asarray(M.max(axis=1).todense()).ravel()
    thr = theta * rowmax
    Mc = M.tocoo()
    keep = Mc.data >= np.maximum(thr[Mc.row], 1e-300)
    S = sp.csr_matrix((Mc.data[keep], (Mc.row[keep], Mc.col[keep])),
                      shape=A.shape)
    return S.maximum(S.T)


def _aggregate(A: sp.csr_matrix, eps: float, block_size: int = 1,
               mode: str = "ratio"):
    """MIS-based greedy aggregation (Luby-style, vectorized — the parallel
    stand-in for Vaněk's sequential greedy pass; quality is comparable and the
    construction is O(nnz·rounds) numpy work, C++-extension ready).

    With ``block_size`` > 1, aggregation runs on the condensed node graph
    (b×b blocks collapsed — the reference's BSR adjacency, BSRAdjacency.cu).
    ``mode`` picks the strength measure: "ratio" = Vaněk |a_ij| ≥
    ε√(a_ii·a_jj); "rowmax" = row-max-relative (see _rowmax_strength)."""
    n = A.shape[0]
    if block_size > 1:
        nb = n // block_size
        C = sp.coo_matrix(A)
        br, bc = C.row // block_size, C.col // block_size
        An = sp.csr_matrix((np.abs(C.data), (br, bc)), shape=(nb, nb))
        agg_nodes, n_agg = _aggregate(An, eps, 1, mode=mode)
        return np.repeat(agg_nodes, block_size), n_agg

    def _group_isolated(agg, n_agg, gsize: int = 32):
        """Bin structurally isolated rows (diagonal-only — Dirichlet
        identity rows) into shared aggregates of ``gsize``. They have no
        graph neighbors, so every aggregator leaves them as permanent
        singletons — a 1M-row elasticity mesh carried a 6,861-node
        singleton floor through EVERY level, ending in a 20,583-row dense
        coarse inverse (284 s / 1.7 GB). Decoupled rows are exactly
        represented by any aggregate (zero cross-coupling) and their error
        lives at λ≈1 of D⁻¹A where the smoother is strongest, so grouping
        them is loss-free and collapses the floor geometrically."""
        row_of = np.repeat(np.arange(n), np.diff(A.indptr))
        offdeg = np.diff(A.indptr) - np.bincount(
            row_of[A.indices == row_of], minlength=n)
        iso = np.flatnonzero(offdeg == 0)
        if len(iso) < 2 * gsize:
            return agg, n_agg
        agg2 = np.asarray(agg).copy()
        agg2[iso] = -1
        live = agg2 >= 0
        _, comp = np.unique(agg2[live], return_inverse=True)
        base = int(comp.max()) + 1 if comp.size else 0
        agg2[live] = comp
        agg2[iso] = base + np.arange(len(iso)) // gsize
        return agg2, base + -(-len(iso) // gsize)

    # native Vaněk greedy aggregation when available (cpp/host_kernels.cpp;
    # sequential but C++-fast — the quality reference); numpy MIS fallback.
    # rowmax mode pre-filters to the strong graph and aggregates it with
    # eps=0 (the native strong() test passes every retained edge).
    from polysolve_tpu import native

    if mode == "rowmax":
        S = _rowmax_strength(A, eps)
        nat = native.greedy_aggregate(S, 0.0)
        if nat is not None:
            return _group_isolated(*nat)
    else:
        nat = native.greedy_aggregate(A, eps)
        if nat is not None:
            return _group_isolated(*nat)
        S = _strength_graph(A, eps)
    rng = np.random.default_rng(12345)
    pri = rng.random(n)
    state = np.zeros(n, dtype=np.int8)  # 0 unknown, 1 root, 2 covered
    # Luby MIS rounds
    for _ in range(64):
        unknown = state == 0
        if not unknown.any():
            break
        p_eff = np.where(unknown, pri, -1.0)
        nbr_max = _row_max(S, p_eff, -1.0)
        new_roots = unknown & (pri > nbr_max)
        # isolated unknown nodes (no strong neighbors) become roots
        deg = np.diff(S.indptr)
        new_roots |= unknown & (deg == 0)
        if not new_roots.any():
            # tie-break stall: promote the max-priority unknown node
            new_roots[np.argmax(np.where(unknown, pri, -1.0))] = True
        state[new_roots] = 1
        # cover neighbors of new roots
        root_flag = np.zeros(n)
        root_flag[new_roots] = 1.0
        covered = (_row_max(S, root_flag, 0.0) > 0) & (state == 0)
        state[covered] = 2

    roots = np.flatnonzero(state == 1)
    n_agg = len(roots)
    agg = np.full(n, -1, dtype=np.int64)
    agg[roots] = np.arange(n_agg)
    # assign non-roots to the strongest neighboring aggregate (vectorized:
    # mask weights of unassigned neighbors to 0 and take a sparse row-argmax;
    # a few passes propagate assignment to nodes with no assigned neighbor yet)
    Scsr = S.tocsr()
    for _ in range(8):
        un_mask = agg < 0
        if not un_mask.any():
            break
        w_eff = np.where(agg[Scsr.indices] >= 0, Scsr.data, 0.0)
        M = sp.csr_matrix((w_eff, Scsr.indices, Scsr.indptr), shape=S.shape)
        rowmax = M.max(axis=1).toarray().ravel()
        best = np.asarray(M.argmax(axis=1)).ravel()
        sel = un_mask & (rowmax > 0)
        if not sel.any():
            break
        agg[sel] = agg[best[sel]]
    un = np.flatnonzero(agg < 0)
    if len(un):  # truly isolated: singleton aggregates
        agg[un] = n_agg + np.arange(len(un))
        n_agg += len(un)
    return _group_isolated(agg, n_agg)


def _tentative_prolongator(agg: np.ndarray, n_agg: int, B: np.ndarray):
    """QR-localized tentative P: columns of the near-nullspace restricted to
    each aggregate, orthonormalized; returns (P_tent, coarse nullspace,
    uniform) where ``uniform`` says every aggregate kept all k columns —
    i.e. the coarse level has an exact k-wide block structure (coarse dof
    agg*k+c), which lets the NEXT level aggregate block-wise again (the
    round-4 coarsening stall: scalar aggregation on block-structured coarse
    elasticity operators degenerates to singletons; AMGCL keeps block value
    types at every level, AMGCL.hpp:48-98)."""
    n, k = B.shape
    order = np.argsort(agg, kind="stable")
    counts = np.bincount(agg, minlength=n_agg)
    max_sz = max(int(counts.max()), k)  # ≥ k rows so reduced QR keeps k columns
    # pack aggregates into a padded batch for one batched QR
    packed = np.zeros((n_agg, max_sz, k))
    pos_in_agg = np.empty(n, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_agg[order] = np.arange(n) - starts[agg[order]]
    packed[agg, pos_in_agg] = B
    Q, Rf = np.linalg.qr(packed)          # (n_agg, max_sz, k), (n_agg, k, k)
    # flip signs for deterministic positive diagonal
    sgn = np.sign(np.einsum("aii->ai", Rf))
    sgn[sgn == 0] = 1.0
    Q = Q * sgn[:, None, :]
    Rf = Rf * sgn[:, :, None]
    # rank-safe: small aggregates can't span all k near-nullspace modes (a
    # 1-node aggregate in 3-D elasticity holds 3 dofs vs 6 RBMs). Deficient
    # directions have ~0 on R's diagonal; keeping their Q columns puts
    # zero/garbage columns into P → zero diagonal in RAP → 1/0 → NaN cycle.
    diag = np.abs(np.einsum("aii->ai", Rf))               # (n_agg, k)
    keep = diag > 1e-10 * np.maximum(diag.max(axis=1, keepdims=True), 1e-300)
    Q = Q * keep[:, None, :]
    # scatter Q back to sparse P (n × n_agg·k), then drop deficient columns
    row_idx = np.tile(np.arange(n)[:, None], (1, k)).ravel()
    col_idx = (agg[:, None] * k + np.arange(k)[None, :]).ravel()
    vals = Q[agg, pos_in_agg].ravel()
    P = sp.csr_matrix((vals, (row_idx, col_idx)), shape=(n, n_agg * k))
    P.eliminate_zeros()
    Bc = Rf.reshape(n_agg * k, k)
    keep_flat = keep.ravel()
    uniform = bool(keep_flat.all())
    if not uniform:
        P = sp.csr_matrix(P[:, keep_flat])
        Bc = Bc[keep_flat]
    return P, Bc, uniform


def _smooth_prolongator(A: sp.csr_matrix, P_tent: sp.csr_matrix,
                        omega: float, rho_da: Optional[float] = None,
                        DA: Optional[sp.csr_matrix] = None):
    """P = (I − ω/ρ(D⁻¹A) · D⁻¹A) · P_tent (Jacobi-smoothed prolongation).
    Returns (P, ω/ρ) — the weight is reused by the device-side structured
    transfer, which must match this host P exactly. ``DA`` forwards a
    precomputed D⁻¹A (setup already row-scaled one)."""
    if DA is None:
        d = A.diagonal()
        d = np.where(d != 0, d, 1.0)
        DA = A.copy()
        DA.data = DA.data / np.repeat(d, np.diff(A.indptr))
    rho = rho_da if rho_da is not None else _spectral_radius_host(DA)
    w = omega / rho
    P = native.spgemm(DA, P_tent, alpha=-w, S=P_tent, beta=1.0)
    if P is None:
        P = sp.csr_matrix(P_tent - w * (DA @ P_tent))
    return P, w


def _detect_grid(A: sp.csr_matrix):
    """Infer a lex-ordered grid from the stencil offsets: returns (mx, my,
    mz) / (mx, my) / None. Cube/square detection (index = ((ix·my)+iy)·mz+iz,
    offset 1 ↔ innermost axis).

    Offsets come from the native single-pass diagonal scan when available
    (the COO + np.unique route materializes and sorts nnz-sized arrays —
    4.5 s of the n=7.08M setup)."""
    n = A.shape[0]
    offs = native.dia_analyze(A, 4096)
    if offs is not None:
        if np.isscalar(offs) or len(offs) == 0:
            return None  # > 4096 distinct diagonals: not a grid stencil
        pos = np.asarray([int(o) for o in offs if o > 0])
    else:
        C = sp.coo_matrix(A)
        pos = np.unique(C.col - C.row)
        pos = pos[pos > 0]
    if len(pos) == 0 or pos.max() > n:
        return None
    m3 = round(n ** (1 / 3))
    if m3 >= 2 and m3 ** 3 == n:
        ok = all(_is_stencil_offset(p, (m3, m3, m3)) for p in pos)
        if ok and (1 in pos) and (m3 in pos or m3 * m3 in pos):
            return (m3, m3, m3)
    m2 = round(n ** 0.5)
    if m2 >= 2 and m2 * m2 == n:
        ok = all(_is_stencil_offset(p, (m2, m2)) for p in pos)
        if ok and (1 in pos) and (m2 in pos):
            return (m2, m2)
    return None


def _is_stencil_offset(p: int, grid) -> bool:
    """p expressible as Σ dᵢ·strideᵢ with dᵢ ∈ {-1, 0, 1}."""
    strides = []
    s = 1
    for g in reversed(grid):
        strides.append(s)
        s *= g
    strides = strides[::-1]
    for d in _signed_combos(len(grid)):
        if sum(di * si for di, si in zip(d, strides)) == p:
            return True
    return False


def _signed_combos(d):
    import itertools

    return itertools.product((-1, 0, 1), repeat=d)


def _box_aggregate(grid) -> np.ndarray:
    """Coarse index of each fine node under 2^d box aggregation (lex order)."""
    n = int(np.prod(grid))
    idx = np.arange(n)
    agg = np.zeros(n, dtype=np.int64)
    rem = idx
    stride_c = 1
    # build coarse index from innermost axis outwards
    coords = []
    for g in reversed(grid):
        coords.append(rem % g)
        rem = rem // g
    coords = coords[::-1]  # [ix, iy, iz]
    cgrid = [g // 2 for g in grid]
    agg = np.zeros(n, dtype=np.int64)
    for c, cg in zip(coords, cgrid):
        agg = agg * cg + c // 2
    return agg


def _spectral_radius_host(A: sp.spmatrix, iters: int = 20) -> float:
    rng = np.random.default_rng(0)
    v = rng.standard_normal(A.shape[0])
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = A @ v
        lam = np.linalg.norm(w)
        if lam == 0:
            return 1.0
        v = w / lam
    return float(lam)


def _dense_inv(Ac: np.ndarray, dtype):
    """Host fp64 inverse of the coarsest operator (pinv on singular — a
    pure-Neumann coarse Laplacian is rank-deficient and the pseudoinverse
    is the right coarse correction for it). The fallback trigger is the
    1-norm condition number κ₁ = ‖A‖₁·‖A⁻¹‖₁ (a true condition estimate,
    free once the inverse exists — not an entrywise proxy), so a merely
    large-entried but well-conditioned coarse operator keeps its exact
    inverse and cycle()'s 'coarsest solve is exact' assumption holds."""
    inv = None
    try:
        inv = np.linalg.inv(Ac)
    except np.linalg.LinAlgError:
        pass
    if inv is not None and np.all(np.isfinite(inv)):
        norm1 = np.abs(Ac).sum(axis=0).max()
        cond1 = norm1 * np.abs(inv).sum(axis=0).max()
        if cond1 < 1e12:
            return jnp.asarray(inv, dtype=dtype)
        logging.getLogger(__name__).debug(
            "coarse operator κ₁≈%.2e — using pseudoinverse (rank-revealing)",
            cond1)
    else:
        logging.getLogger(__name__).debug(
            "coarse operator numerically singular — using pseudoinverse")
    # tight rcond: drop only the genuinely tiny tail (nullspace modes — the
    # fp64 noise floor of the largest singular value), keep small-but-real
    # singular values of an ill-conditioned-yet-nonsingular operator
    rcond = np.finfo(np.float64).eps * max(Ac.shape) * 10
    inv = np.linalg.pinv(Ac, rcond=rcond)
    return jnp.asarray(inv, dtype=dtype)
