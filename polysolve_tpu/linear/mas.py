"""MAS — the reference's flagship native GPU solver (multilevel additive
Schwarz PCG, arXiv:2411.06224; reference MASSolver.cu / MASPreconditioner.cu),
rebuilt TPU-first.

The reference pipeline (MASSolver.cu:292-374): block adjacency → KaMinPar
32-node banks → permuted BSR → multilevel warp-local preconditioner → fully
device-resident PCG with device scalars and periodic convergence reads.

TPU mapping here:

- banks = contiguous ``bank_size``-node windows after RCM ordering (band
  locality replaces the graph partitioner; KaMinPar-quality partitioning is a
  host C++ upgrade path — reference GraphPartition.cpp:176-289);
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

import jax.numpy as jnp

from polysolve_tpu import ops
from polysolve_tpu.linear import preconditioners
from polysolve_tpu.linear.iterative import KrylovSolver
from polysolve_tpu.linear.solver import register_solver


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
            "bank_size": leaf_i(32),          # BANK_SIZE (GraphPartition.cpp:255-273)
            "levels": leaf_i(4),              # ≤4 coarse levels (MASPreconditioner.hpp:10-12)
            "lazy_partitioning": {"type": "bool", "default": True},
            "use_preconditioned_residual_norm": {"type": "bool", "default": False},
        }

    def __init__(self):
        super().__init__()
        self.perm: Optional[np.ndarray] = None
        self._lazy = True

    def _atol(self) -> float:
        return float(self.params.get("abs_tolerance", 1e-8))

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        super().analyze_pattern(A, precond_num)
        A = sp.csr_matrix(A)
        # node-level RCM so each bank is a tight band window (the role of the
        # reference's KaMinPar partition + permutation, MASSolver.cu:83-131)
        bd = int(self.params.get("block_dim", 1))
        if bd > 1:
            C = sp.coo_matrix(A)
            nb = A.shape[0] // bd
            An = sp.csr_matrix(
                (np.abs(C.data), (C.row // bd, C.col // bd)), shape=(nb, nb)
            )
            node_perm = np.asarray(reverse_cuthill_mckee(An, symmetric_mode=True))
            self.perm = (node_perm[:, None] * bd + np.arange(bd)[None, :]).ravel()
        else:
            self.perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))

    def factorize(self, A: sp.spmatrix) -> None:
        A = sp.csr_matrix(A)
        if self.perm is None or len(self.perm) != A.shape[0] or not bool(
            self.params.get("lazy_partitioning", True)
        ):
            # lazy_partitioning reuses the first partition across
            # refactorizations (reference MASSolver.cu:304-321)
            self.analyze_pattern(A, self.precond_num)
        Ap = A[self.perm][:, self.perm]
        self.A_host = sp.csr_matrix(Ap)
        bd = int(self.params.get("block_dim", 1))
        self.A_dev = ops.to_device_matrix(self.A_host, block_size=bd)
        self.pstate = preconditioners.make(
            "MAS", self.A_host, self.A_dev,
            params={"bank_size": int(self.params.get("bank_size", 32)),
                    "levels": int(self.params.get("levels", 4))},
            block_size=bd, logger=self.logger,
        )

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        b = np.asarray(b, dtype=np.float64)
        bp = b[self.perm] if b.ndim == 1 else b[self.perm, :]
        x0 = None
        if x is not None:
            x = np.asarray(x, dtype=np.float64)
            x0 = x[self.perm] if x.ndim == 1 else x[self.perm, :]
        out_p = super().solve(bp, x0)
        out = np.empty_like(out_p)
        out[self.perm] = out_p
        return out

    def get_info(self) -> Dict[str, Any]:
        info = super().get_info()
        # reference get_info: iter + residual + status string (MASSolver.cu:214-219)
        info["status"] = "CONVERGED" if self._error <= self._tol() or \
            self._iters < self._max_iter() else "MAX_ITER"
        return info
