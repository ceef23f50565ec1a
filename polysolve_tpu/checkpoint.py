"""Checkpoint / resume + symbolic-object persistence.

The reference has **no** checkpointing (SURVEY.md §5); its nearest mechanisms
are the symbolic/numeric split (`analyze_pattern` once, re-`factorize` many —
test_linear_solver.cpp:241-307), MAS ``lazy_partitioning``
(MASSolver.cu:304-321) and warm-start solves. This module supplies what the
reference lacks, as SURVEY.md §5 prescribes for the TPU build:

- ``pattern_hash``   — a stable digest of a sparsity pattern; the cache key
  for every symbolic object (orderings, block-fill tables, AMG aggregates).
- ``SymbolicCache``  — process-wide + optional on-disk cache of symbolic
  objects keyed by (kind, pattern hash). A Newton loop that re-creates
  solvers, or a *restarted process*, skips the symbolic phase entirely.
- ``save_solver_state`` / ``load_solver_state`` — orbax-style checkpoint of
  long-running solver state (Newton iterate + criteria, Krylov warm-start
  vector) so a preempted multi-hour solve resumes instead of restarting.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp


def pattern_hash(A: sp.spmatrix) -> str:
    """Digest of the sparsity pattern (shape + indptr + indices), independent
    of the values — the key under which symbolic work is reusable."""
    A = sp.csr_matrix(A)
    h = hashlib.sha1()
    h.update(np.asarray(A.shape, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(A.indptr, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(A.indices, dtype=np.int64).tobytes())
    return h.hexdigest()


class SymbolicCache:
    """(kind, pattern-hash)-keyed cache with optional directory persistence.

    In-memory entries are shared process-wide through :data:`default_cache`;
    pass ``directory`` to also persist across processes (each entry one
    pickle file — symbolic objects are plain numpy dataclasses).
    """

    def __init__(self, directory: Optional[str] = None, max_entries: int = 32):
        self.directory = directory
        self.max_entries = int(max_entries)
        self._mem: Dict[str, Any] = {}
        if directory:
            os.makedirs(directory, exist_ok=True)

    def _key(self, kind: str, phash: str) -> str:
        return f"{kind}-{phash}"

    def get(self, kind: str, phash: str) -> Optional[Any]:
        key = self._key(kind, phash)
        if key in self._mem:
            return self._mem[key]
        if self.directory:
            path = os.path.join(self.directory, key + ".pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    obj = pickle.load(f)
                self._mem[key] = obj
                return obj
        return None

    def put(self, kind: str, phash: str, obj: Any) -> None:
        key = self._key(kind, phash)
        if len(self._mem) >= self.max_entries:
            self._mem.pop(next(iter(self._mem)))
        self._mem[key] = obj
        if self.directory:
            path = os.path.join(self.directory, key + ".pkl")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)

    def clear(self) -> None:
        self._mem.clear()


#: process-wide default (memory-only; point it at a directory to persist)
default_cache = SymbolicCache()


# --------------------------------------------------------------------------- #
# Solver-state checkpointing                                                  #
# --------------------------------------------------------------------------- #


def save_solver_state(path: str, **state: Any) -> None:
    """Atomically save named arrays/scalars (npz). Typical payload: the
    Newton iterate ``x``, iteration count, strategy index, criteria fields,
    Krylov warm-start vector."""
    arrays = {}
    for k, v in state.items():
        arrays[k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_solver_state(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load a checkpoint saved by :func:`save_solver_state`; None if absent."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def checkpointed_minimize(solver, problem, x0: np.ndarray, path: str,
                          every: int = 10) -> np.ndarray:
    """Run ``solver.minimize`` with periodic state checkpoints and automatic
    resume: if ``path`` holds a previous checkpoint for the same dof count,
    the iterate restarts from it (the nonlinear analog of the Krylov
    warm-start contract)."""
    prev = load_solver_state(path)
    x0 = np.asarray(x0, dtype=np.float64)
    if prev is not None and "x" in prev and prev["x"].shape == x0.shape:
        x0 = prev["x"].astype(np.float64)

    orig_post_step = problem.post_step

    def post_step(data):
        if data.iter_num % max(every, 1) == 0:
            save_solver_state(path, x=data.x, iteration=data.iter_num)
        return orig_post_step(data)

    problem.post_step = post_step
    try:
        x = solver.minimize(problem, x0)
    finally:
        problem.post_step = orig_post_step
    save_solver_state(path, x=x, iteration=solver.current.iterations)
    return x
