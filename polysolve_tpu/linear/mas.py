"""MAS — the reference's flagship native GPU solver (multilevel additive
Schwarz PCG, arXiv:2411.06224; reference MASSolver.cu / MASPreconditioner.cu),
rebuilt TPU-first.

The reference pipeline (MASSolver.cu:292-374): block adjacency → KaMinPar
32-node banks → permuted BSR → multilevel warp-local preconditioner → fully
device-resident PCG with device scalars and periodic convergence reads.

TPU mapping here:

- banks come from the native **multilevel K-way graph partitioner**
  (cpp/host_kernels.cpp ``kway_partition`` — the KaMinPar role,
  GraphPartition.cpp:176-289) with K = ⌈n/(bank−2)⌉ per the paper's Eq.7;
  each part is padded to exactly ``bank`` nodes with decoupled identity
  dummy rows — the reference's real↔padded bank maps
  (MASPreconditioner.cu:58-110, fig.6 of the paper). RCM windows are the
  fallback when the native library is absent;
- the preconditioner = banked block-Jacobi with **batched dense inverses**
  applied as one batched matvec — exactly the MXU-shaped work the reference
  does with warp Gauss-Jordan + shared-memory symv
  (MASPreconditioner.cu:798-936, :661-743); multilevel coarse correction is
  the additive second term built from aggregated bank residuals;
- the PCG loop is the shared ``krylov.cg`` driver: ``lax.while_loop`` keeps
  every scalar on device (the reference's device-scalar design,
  MASSolver.cu:469-595), with the same rel/abs tolerance pair
  (rel 1e-5 / abs 1e-8, MASSolver.cu:138-143).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from polysolve_tpu import native, ops
from polysolve_tpu.linear import preconditioners
from polysolve_tpu.linear.iterative import KrylovSolver
from polysolve_tpu.linear.solver import register_solver


def _bank_partition(An: sp.csr_matrix, bank: int):
    """Partition the node graph into parts of ≤ ``bank`` nodes.

    Native multilevel K-way partition (K = ⌈n/(bank−2)⌉, the paper's Eq.7 —
    GraphPartition.cpp:255-273) with oversize parts split in part-local
    order; RCM windows as fallback. Returns a list of node-index arrays."""
    n = An.shape[0]
    k = max(-(-n // max(bank - 2, 1)), 1)
    off = sp.csr_matrix(An - sp.diags(An.diagonal()))
    off.eliminate_zeros()
    part = native.kway_partition(off, k) if k > 1 else np.zeros(n, np.int32)
    if part is None:
        # fallback: RCM band windows (contiguous after reordering)
        perm = np.asarray(reverse_cuthill_mckee(An, symmetric_mode=True))
        return [perm[i: i + bank] for i in range(0, n, bank)]
    parts = []
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(k + 1))
    for p in range(k):
        nodes = order[bounds[p]: bounds[p + 1]]
        for i in range(0, len(nodes), bank):  # enforce the hard cap
            chunk = nodes[i: i + bank]
            if len(chunk):
                parts.append(chunk)
    return parts


@register_solver("MAS")
class MASSolver(KrylovSolver):
    """Banked additive-Schwarz PCG (reference MASSolver.cu)."""

    driver = "CG"
    default_max_iter = 5000        # MASSolver.cu:138-143
    default_tolerance = 1e-5       # relative tolerance

    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        leaf_f = lambda d: {"type": "float", "default": d}
        leaf_i = lambda d: {"type": "int", "default": d}
        return {
            "block_dim": leaf_i(1),           # dofs per node (1/2/3)
            "max_iter": leaf_i(cls.default_max_iter),
            "tolerance": leaf_f(1e-5),
            "abs_tolerance": leaf_f(1e-8),
            # the reference spec's names (linear-solver-spec.json:481-497);
            # -1 = unset sentinel (spec injects defaults, so presence alone
            # can't signal user intent); explicitly set values win over the
            # generic tolerance pair
            "relative_tolerance": leaf_f(-1.0),
            "absolute_tolerance": leaf_f(-1.0),
            "bank_size": leaf_i(32),          # BANK_SIZE (GraphPartition.cpp:255-273)
            "levels": leaf_i(4),              # ≤4 coarse levels (MASPreconditioner.hpp:10-12)
            "lazy_partitioning": {"type": "bool", "default": True},
            "use_preconditioned_residual_norm": {"type": "bool", "default": False},
            # "bank" (whole-bank, measured winner) or "cco" (reference's
            # per-bank connected components, MASPreconditioner.cu:376-481)
            "coarse_space": {"type": "string", "default": "bank"},
        }

    def __init__(self):
        super().__init__()
        self.pad_src: Optional[np.ndarray] = None  # padded slot → source node
        self.n_real = 0
        self._n_parts = 0

    def _atol(self) -> float:
        v = float(self.params.get("absolute_tolerance", -1.0))
        return v if v >= 0 else float(self.params.get("abs_tolerance", 1e-8))

    def _tol(self) -> float:
        v = float(self.params.get("relative_tolerance", -1.0))
        return v if v > 0 else super()._tol()

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        KrylovSolver.analyze_pattern(self, A, precond_num)
        A = sp.csr_matrix(A)
        self.n_real = A.shape[0]
        bd = int(self.params.get("block_dim", 1))
        bank = int(self.params.get("bank_size", 32))
        # node-level adjacency (block-condensed for bd > 1 — the reference's
        # BSR adjacency, BSRAdjacency.cu)
        if bd > 1:
            C = sp.coo_matrix(A)
            nn = A.shape[0] // bd
            An = sp.csr_matrix(
                (np.abs(C.data), (C.row // bd, C.col // bd)), shape=(nn, nn))
        else:
            An = sp.csr_matrix(np.abs(A))
        parts = _bank_partition(An, bank)
        self._n_parts = len(parts)
        # padded node layout: part p occupies node slots [p·bank, (p+1)·bank);
        # unfilled slots are decoupled dummy nodes (identity rows)
        pad_nodes = np.full(len(parts) * bank, -1, dtype=np.int64)
        for p, nodes in enumerate(parts):
            pad_nodes[p * bank: p * bank + len(nodes)] = nodes
        # expand node slots to dof slots
        if bd > 1:
            src = np.where(
                pad_nodes[:, None] >= 0,
                pad_nodes[:, None] * bd + np.arange(bd)[None, :],
                -1,
            ).ravel()
        else:
            src = pad_nodes
        self.pad_src = src

    def _build_padded(self, A: sp.csr_matrix) -> sp.csr_matrix:
        """P A Pᵀ plus identity on dummy slots (the reference's padded bank
        system, MASPreconditioner.cu:58-110)."""
        n_pad = len(self.pad_src)
        real = self.pad_src >= 0
        rows = np.flatnonzero(real)
        P = sp.csr_matrix(
            (np.ones(len(rows)), (rows, self.pad_src[real])),
            shape=(n_pad, self.n_real),
        )
        Apad = sp.csr_matrix(P @ A @ P.T)
        dummy = (~real).astype(np.float64)
        if dummy.any():
            Apad = sp.csr_matrix(Apad + sp.diags(dummy))
        self._P = P
        return Apad

    def factorize(self, A: sp.spmatrix) -> None:
        A = sp.csr_matrix(A)
        if self.pad_src is None or self.n_real != A.shape[0] or not bool(
            self.params.get("lazy_partitioning", True)
        ):
            # lazy_partitioning reuses the first partition across
            # refactorizations (reference MASSolver.cu:304-321)
            self.analyze_pattern(A, self.precond_num)
        bd = int(self.params.get("block_dim", 1))
        self.A_host = self._build_padded(A)
        self.A_dev = ops.to_device_matrix(self.A_host, block_size=bd)
        self.pstate = preconditioners.make(
            "MAS", self.A_host, self.A_dev,
            params={"bank_size": int(self.params.get("bank_size", 32)),
                    "levels": int(self.params.get("levels", 4)),
                    "coarse_space": str(self.params.get("coarse_space",
                                                        "bank"))},
            block_size=bd, logger=self.logger,
        )

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        b = np.asarray(b, dtype=np.float64)
        bp = self._P @ b
        x0 = self._P @ np.asarray(x, dtype=np.float64) if x is not None else None
        out_p = KrylovSolver.solve(self, bp, x0)
        return self._P.T @ out_p

    def get_info(self) -> Dict[str, Any]:
        info = KrylovSolver.get_info(self)
        # reference get_info: iter + residual + status string (MASSolver.cu:214-219)
        info["status"] = "CONVERGED" if self._error <= self._tol() or \
            self._iters < self._max_iter() else "MAX_ITER"
        info["num_banks"] = self._n_parts
        info["padded_n"] = 0 if self.pad_src is None else len(self.pad_src)
        return info
