"""Distributed solves over a 1-D row mesh via ``shard_map``.

The TPU analog of the reference's single-device MAS PCG
(MASSolver.cu:469-595), scaled out:

- the matrix (DIA format — stencil/banded after ordering) is row-partitioned:
  each device owns a contiguous block of rows and the matching slice of every
  vector;
- SpMV needs only the halo segments of x from the two neighbors — exchanged
  with ``lax.ppermute`` (nearest-neighbor ICI traffic, the ring-attention-style
  overlap analog, SURVEY.md §5 "long-context");
- Krylov dot products are local dots + one ``psum`` over the mesh axis;
- the whole PCG is ONE ``shard_map``-wrapped jitted ``lax.while_loop`` — zero
  host round-trips during the solve, matching the reference's device-scalar
  design.

The same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for testing and on a real TPU
pod slice: only the Mesh construction differs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from polysolve_tpu.parallel.mesh import ROWS_AXIS, make_mesh


def _halo_widths(offsets) -> Tuple[int, int]:
    return max(0, -min(offsets)), max(0, max(offsets))


def sharded_dia_matvec(vals_loc: jnp.ndarray, x_loc: jnp.ndarray,
                       offsets: Tuple[int, ...], axis: str = ROWS_AXIS,
                       n_shards: int = 1) -> jnp.ndarray:
    """Per-shard DIA SpMV with nearest-neighbor halo exchange.

    ``vals_loc`` (K, r) diag-major and ``x_loc`` (r,) are this device's row
    block.
    Assumes halo width ≤ r (always true for band ≪ shard size).
    """
    L, R = _halo_widths(offsets)
    r = x_loc.shape[0]
    if L > r or R > r:
        # halo wider than a shard (tiny systems / many devices): fall back to
        # a full all-gather of x — still one collective per SpMV
        xg = lax.all_gather(x_loc, axis, tiled=True)
        xp_full = jnp.pad(xg, (L, R))
        start = lax.axis_index(axis) * r
        y = jnp.zeros(r, dtype=jnp.result_type(vals_loc.dtype, x_loc.dtype))
        for k, off in enumerate(offsets):
            seg = lax.dynamic_slice_in_dim(xp_full, start + off + L, r)
            y = y + vals_loc[k] * seg
        return y
    parts = []
    if L > 0:
        # my left halo = right edge of my left neighbor (shift right: i → i+1)
        left = lax.ppermute(x_loc[-L:], axis,
                            perm=[(i, i + 1) for i in range(n_shards - 1)])
        parts.append(left)
    parts.append(x_loc)
    if R > 0:
        right = lax.ppermute(x_loc[:R], axis,
                             perm=[(i + 1, i) for i in range(n_shards - 1)])
        parts.append(right)
    xp = jnp.concatenate(parts) if len(parts) > 1 else x_loc
    y = jnp.zeros(r, dtype=jnp.result_type(vals_loc.dtype, x_loc.dtype))
    for k, off in enumerate(offsets):
        y = y + vals_loc[k] * lax.slice_in_dim(xp, L + off, L + off + r)
    return y


def dist_cg(vals_loc, inv_diag_loc, b_loc, x0_loc, offsets, tol, max_iter,
            axis: str = ROWS_AXIS, n_shards: int = 1):
    """Jacobi-preconditioned CG, fully inside a shard_map region: local
    vectors, ppermute halos, psum reductions. Returns (x_loc, iters, relres)."""

    def pdot(a, b):
        return lax.psum(jnp.vdot(a, b), axis)

    def mv(v):
        return sharded_dia_matvec(vals_loc, v, offsets, axis, n_shards)

    bnorm2 = pdot(b_loc, b_loc)
    thresh = tol * tol * bnorm2
    r0 = b_loc - mv(x0_loc)
    z0 = inv_diag_loc * r0
    rz0 = pdot(r0, z0)
    rr0 = pdot(r0, r0)

    def cond(s):
        x, r, p, rz, rr, k = s
        return (k < max_iter) & (rr > thresh)

    def body(s):
        x, r, p, rz, rr, k = s
        Ap = mv(p)
        alpha = rz / pdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag_loc * r
        rz_new = pdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, pdot(r, r), k + 1)

    x, r, p, rz, rr, k = lax.while_loop(
        cond, body, (x0_loc, r0, z0, rz0, rr0, jnp.int32(0)))
    relres = jnp.sqrt(rr / jnp.where(bnorm2 == 0, 1.0, bnorm2))
    return x, k, relres


class DistributedDIA:
    """Row-sharded DIA (banded/stencil) system + one-shot jitted distributed
    PCG. Works for any matrix convertible to DIA after ordering — 3D Poisson
    is the benchmark instance.

    This is the flagship multi-chip path: build once per pattern
    (``analyze``), then ``solve`` runs the entire preconditioned CG as one
    XLA program over the mesh.
    """

    def __init__(self, A: sp.spmatrix, mesh: Optional[Mesh] = None,
                 dtype=jnp.float32):
        from polysolve_tpu.types import dia_from_scipy

        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.devices.size
        A = sp.csr_matrix(A)
        self.n = A.shape[0]
        # pad rows to a multiple of the shard count (identity tail rows)
        pad = (-self.n) % self.n_shards
        if pad:
            A = sp.bmat([[A, None], [None, sp.identity(pad, format="csr")]],
                        format="csr")
        self.n_padded = A.shape[0]
        Ad = dia_from_scipy(A, dtype=dtype, max_diags=4096)
        self.offsets = Ad.offsets
        self.nnz = Ad.nnz
        self.dtype = dtype
        shard_rows = NamedSharding(self.mesh, P(self.axis))
        shard_vals = NamedSharding(self.mesh, P(None, self.axis))  # (K, n) diag-major
        self.vals = jax.device_put(Ad.vals, shard_vals)
        d = Ad.diagonal()
        inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
        self.inv_diag = jax.device_put(inv, shard_rows)
        self._shard_rows = shard_rows

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P(self.axis), P(self.axis),
                      P(self.axis), None, None),
            out_specs=(P(self.axis), P(), P()),
        )
        def _solve(vals_loc, inv_diag_loc, b_loc, x0_loc, tol, max_iter):
            x, k, res = dist_cg(vals_loc, inv_diag_loc, b_loc, x0_loc,
                                self.offsets, tol, max_iter,
                                axis=self.axis, n_shards=self.n_shards)
            return x, k, res

        self._solve_jit = jax.jit(_solve)

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P(self.axis)),
            out_specs=P(self.axis),
        )
        def _matvec(vals_loc, x_loc):
            return sharded_dia_matvec(vals_loc, x_loc, self.offsets,
                                      self.axis, self.n_shards)

        self._matvec_jit = jax.jit(_matvec)

    def _pad(self, v):
        v = np.asarray(v, dtype=np.float64)
        if len(v) < self.n_padded:
            v = np.concatenate([v, np.zeros(self.n_padded - len(v))])
        return jax.device_put(jnp.asarray(v, dtype=self.dtype), self._shard_rows)

    def matvec(self, x):
        return self._matvec_jit(self.vals, self._pad(x))[: self.n]

    def solve(self, b, x0=None, tol: float = 1e-6, max_iter: int = 1000):
        b_d = self._pad(b)
        x0_d = self._pad(x0 if x0 is not None else np.zeros(self.n))
        x, k, res = self._solve_jit(self.vals, self.inv_diag, b_d, x0_d,
                                    jnp.asarray(tol, dtype=self.dtype),
                                    jnp.int32(max_iter))
        return np.asarray(x, dtype=np.float64)[: self.n], int(k), float(res)


# Backwards-compatible name (the benchmark instance)
DistributedPoisson = DistributedDIA
