"""Debug-mode invariant checks — the framework's sanitizer layer.

The reference's closest mechanisms (SURVEY.md §5): CMake ASan/TSan opt-ins
and the partitioner's debug graph validation (symmetry, no self-loops, weight
consistency — GraphPartition.cpp:22-174). Python needs no memory sanitizers;
what it does need are the *numerical/structural* invariants:

- :func:`check_graph`      — CSR symmetry / self-loop / index-range audit
  (the GraphPartition.cpp:22-174 port);
- :func:`check_partition`  — every node assigned, part-size bounds,
  halo-map symmetry (if chip a needs rows from b, b's column range covers a);
- :func:`check_spd_hint`   — cheap SPD sanity (symmetry + positive diagonal);
- :func:`nan_guard`        — wrap a matvec/callable with `jax.debug` NaN
  checks (device-side, jit-compatible).

All checks raise ``ValidationError`` with a precise message. They are *opt-in*
(call them from tests or behind a debug flag) — production paths stay clean.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import scipy.sparse as sp


class ValidationError(ValueError):
    pass


def check_graph(A: sp.spmatrix, require_symmetric: bool = True,
                allow_self_loops: bool = False) -> None:
    """Structural audit of a CSR graph (reference GraphPartition.cpp:22-174:
    symmetry, self-loops, index ranges, weight consistency)."""
    A = sp.csr_matrix(A)
    n, m = A.shape
    if A.indices.size and (A.indices.min() < 0 or A.indices.max() >= m):
        raise ValidationError("column index out of range")
    if np.any(np.diff(A.indptr) < 0):
        raise ValidationError("indptr is not monotone")
    if not allow_self_loops:
        C = A.tocoo()
        if np.any(C.row == C.col):
            raise ValidationError("graph has self-loops")
    if require_symmetric:
        D = (A - A.T).tocoo()
        if D.nnz and np.abs(D.data).max() > 1e-12 * max(np.abs(A.data).max(), 1.0):
            i = int(np.argmax(np.abs(D.data)))
            raise ValidationError(
                f"graph not symmetric: A[{D.row[i]},{D.col[i]}] != "
                f"A[{D.col[i]},{D.row[i]}] (diff {D.data[i]:.3e})")


def check_partition(part: np.ndarray, k: int,
                    max_part_size: int | None = None) -> None:
    """Partition-assignment invariants (every node assigned, ids in range,
    optional hard size cap — the MAS bank contract)."""
    part = np.asarray(part)
    if np.any(part < 0) or np.any(part >= k):
        raise ValidationError(f"part ids outside [0, {k})")
    sizes = np.bincount(part, minlength=k)
    if max_part_size is not None and sizes.max(initial=0) > max_part_size:
        raise ValidationError(
            f"part size {int(sizes.max())} exceeds cap {max_part_size}")


def check_halo_symmetry(A: sp.spmatrix, n_shards: int) -> None:
    """Row-partition halo-map symmetry: if shard s reads columns owned by
    shard t, then (for symmetric A) t reads columns owned by s — the
    correctness precondition of the ppermute halo ring
    (parallel/distributed.py; SURVEY.md §7 hard-part #6)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    rows_per = -(-n // n_shards)
    need = np.zeros((n_shards, n_shards), dtype=bool)
    C = A.tocoo()
    src = np.minimum(C.row // rows_per, n_shards - 1)
    dst = np.minimum(C.col // rows_per, n_shards - 1)
    need[src, dst] = True
    if not np.array_equal(need, need.T):
        a, b = np.argwhere(need != need.T)[0]
        raise ValidationError(
            f"halo map asymmetric between shards {a} and {b} "
            "(matrix pattern not symmetric?)")


def check_spd_hint(A: sp.spmatrix) -> None:
    """Cheap SPD preconditions: symmetry + strictly positive diagonal.
    (A full check is the factorization itself — reference factorize throws
    on Eigen::NumericalIssue, EigenSolver.tpp:44-52.)"""
    A = sp.csr_matrix(A)
    d = A.diagonal()
    if np.any(d <= 0):
        i = int(np.argmin(d))
        raise ValidationError(f"non-positive diagonal at row {i}: {d[i]:.3e}")
    check_graph(A, require_symmetric=True, allow_self_loops=True)


def nan_guard(fn: Callable, name: str = "value") -> Callable:
    """Wrap a jittable callable with a device-side NaN/Inf check
    (`jax.debug` analog of the reference's nan→NanEncountered guards,
    nonlinear Solver.cpp:302-307). Works under jit."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify  # noqa: F401  (documented upgrade)

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)

        def _chk(leaf):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                jax.debug.callback(_raise_on_nan, jnp.all(jnp.isfinite(leaf)),
                                   ordered=False)
            return leaf

        jax.tree_util.tree_map(_chk, out)
        return out

    def _raise_on_nan(ok):
        if not bool(ok):
            raise FloatingPointError(f"NaN/Inf detected in {name}")

    return wrapped
