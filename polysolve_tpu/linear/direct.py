"""Sparse direct factorizations, TPU-style.

Replaces the reference's direct-sparse family — SimplicialLDLT, the CHOLMOD
wrappers, Pardiso (SPD mtype=2 path, Pardiso.cpp:203-398), UmfPack/SuperLU
(reference Solver.cpp:314-386) — per SURVEY.md §7 step 7.

Design: TPUs want large dense tiles, not pointer-chasing supernode DAGs. The
round-1 factorization is a **block-tridiagonal banded Cholesky**:

1. *symbolic* (host): reverse Cuthill–McKee ordering (`analyze_pattern`) →
   bandwidth ``p`` of the permuted pattern; pick block size ``m ≥ p`` (rounded
   to the 8-lane sublane tile). The permuted matrix is then block-tridiagonal
   with dense ``m×m`` blocks.
2. *numeric* (device): a single ``lax.scan`` over block columns —
   ``S = A_kk − C·Cᵀ;  L_kk = chol(S);  C' = A_{k+1,k}·L_kk⁻ᵀ`` — every op a
   dense ``m×m`` Cholesky / TRSM / GEMM on the MXU.
3. *solve* (device): two block-bidiagonal triangular sweeps (``lax.scan``
   forward + backward), multi-RHS batched.

Cost is O(n·m²) flops / O(n·m) memory — the classical band bound; for meshes
ordered by RCM this is the right direct method on TPU. Matrices whose band is
too wide fall back to dense Cholesky/LU (still XLA-native).

``analyze_pattern`` / ``factorize`` keep the reference's symbolic/numeric
split contract (pre_factor test, test_linear_solver.cpp:241-307): the
ordering + block partition are computed once per pattern and reused.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

import jax
import jax.numpy as jnp

from polysolve_tpu.linear.solver import Solver, register_solver
from polysolve_tpu.types import default_dtype


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=())
def _block_tridiag_cholesky(diag_blocks, sub_blocks):
    """Factor the block-tridiagonal SPD matrix given by ``diag_blocks``
    (nb, m, m) and ``sub_blocks`` (nb, m, m) where sub_blocks[k] = A_{k+1,k}
    (the last entry is ignored/zero). Returns (L_diag, L_sub)."""
    m = diag_blocks.shape[1]
    eye = jnp.eye(m, dtype=diag_blocks.dtype)

    def step(carry, inputs):
        C = carry  # L_{k,k-1}
        Akk, Asub = inputs
        S = Akk - C @ C.T
        Lkk = jnp.linalg.cholesky(S)
        # L_{k+1,k} = A_{k+1,k} · L_kk^{-T}
        Lsub = jax.scipy.linalg.solve_triangular(
            Lkk, Asub.T, lower=True
        ).T
        return Lsub, (Lkk, Lsub)

    _, (L_diag, L_sub) = jax.lax.scan(
        step, jnp.zeros((m, m), dtype=diag_blocks.dtype), (diag_blocks, sub_blocks)
    )
    return L_diag, L_sub


@jax.jit
def _block_tridiag_solve(L_diag, L_sub, B):
    """Solve L Lᵀ X = B with blocked forward/backward substitution.
    B: (nb, m, k)."""

    def fwd(carry, inputs):
        y_prev = carry
        Lkk, Lprev_sub, bk = inputs
        rhs = bk - Lprev_sub @ y_prev
        yk = jax.scipy.linalg.solve_triangular(Lkk, rhs, lower=True)
        return yk, yk

    nb, m, k = B.shape
    zero = jnp.zeros((m, k), dtype=B.dtype)
    # L_{k,k-1} for block k is L_sub[k-1]
    Lprev = jnp.concatenate([jnp.zeros_like(L_sub[:1]), L_sub[:-1]], axis=0)
    _, Y = jax.lax.scan(fwd, zero, (L_diag, Lprev, B))

    def bwd(carry, inputs):
        x_next = carry
        Lkk, Lsub_k, yk = inputs
        rhs = yk - Lsub_k.T @ x_next
        xk = jax.scipy.linalg.solve_triangular(Lkk.T, rhs, lower=False)
        return xk, xk

    _, Xrev = jax.lax.scan(bwd, zero, (L_diag, L_sub, Y), reverse=True)
    return Xrev


@register_solver(
    "SparseCholesky",
    aliases=[
        "Eigen::SimplicialLDLT",
        "Eigen::SimplicialLLT",
        "Eigen::CholmodSupernodalLLT",
        "Eigen::CholmodSimplicialLLT",
        "Eigen::CholmodSimplicialLDLT",
        "Eigen::CholmodDecomposition",
        "Eigen::AccelerateLLT",
        "Eigen::AccelerateLDLT",
        "Eigen::PardisoLLT",
        "Eigen::PardisoLDLT",
        "Pardiso",
    ],
)
class SparseCholeskySolver(Solver):
    """Sparse direct Cholesky (SPD). Covers every SPD direct backend of the
    reference (the Pardiso mtype=2 path required by BASELINE.md).

    Mode auto-selection in ``analyze_pattern``:

    - ``band``       — RCM gives a narrow band → block-tridiagonal Cholesky
      (one ``lax.scan`` of m×m POTRF/TRSM/GEMM; zero index tables);
    - ``supernodal`` — general patterns → minimum-degree + postordered
      blocked right-looking factorization (linear/supernodal.py — the
      CHOLMOD-supernodal role);
    - ``dense``      — tiny systems.

    On fp32 devices (TPU), ``solve`` applies iterative refinement with a
    float64 host residual by default, recovering reference-grade (1e-8…1e-14)
    residuals from an fp32 factorization (SURVEY.md §7 hard-part #4).
    """

    # band wider than this → prefer the supernodal path
    band_max_block = 192
    min_dense_n = 256

    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        return {
            "block_multiple": {"type": "int", "default": 8},
            "mtype": {"type": "int", "default": 2},  # accepted for Pardiso parity
            "mode": {"type": "string", "default": "auto"},
            "tile": {"type": "int", "default": 32},  # supernodal tile size
            "max_refine_iter": {"type": "int", "default": 4},
        }

    def __init__(self):
        super().__init__()
        self.perm: Optional[np.ndarray] = None
        self.m: int = 0          # band block size
        self.nb: int = 0         # number of band blocks
        self.n: int = 0
        self.mode: str = "auto"
        self.L = None            # dense factor or (L_diag, L_sub)
        self.snl = None          # SupernodalCholesky
        self.A_host: Optional[sp.csr_matrix] = None
        self._pattern_nnz = -1

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        A = sp.csr_matrix(A)
        self.n = A.shape[0]
        self._pattern_nnz = A.nnz
        requested = str(self.params.get("mode", "auto"))
        self.perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
        Ap = A[self.perm][:, self.perm].tocoo()
        bw = int(np.abs(Ap.row - Ap.col).max(initial=0))
        mult = int(self.params.get("block_multiple", 8))
        self.m = max(_round_up(max(bw, 1), mult), mult)
        if requested != "auto":
            self.mode = requested
        elif self.n <= self.min_dense_n:
            self.mode = "dense"
        elif self.m <= self.band_max_block:
            self.mode = "band"
        else:
            self.mode = "supernodal"
        if self.mode == "band":
            self.nb = _round_up(self.n, self.m) // self.m
        elif self.mode == "supernodal":
            from polysolve_tpu.linear.supernodal import SupernodalCholesky

            # tile 64 at scale: 4x MXU tile utilization and ~4x fewer
            # level-schedule steps — measured 251.7 vs 40.5 GFLOP/s against
            # tile 32 at n=110k (round4_tpu_results.jsonl); small problems
            # keep 32 (fill padding dominates)
            tile_default = 64 if A.shape[0] >= (1 << 15) else 32
            self.snl = SupernodalCholesky(
                tile=int(self.params.get("tile", tile_default)))
            self.snl.analyze(A)

    def factorize(self, A) -> None:
        if sp.issparse(A):
            A = sp.csr_matrix(A)
        else:
            A = sp.csr_matrix(np.asarray(A))
        if self.perm is None or A.shape[0] != self.n:
            self.analyze_pattern(A)
        self.A_host = A
        dtype = default_dtype()
        if self.mode == "supernodal":
            self.snl.factorize(A)  # raises on numerical issue
            self.L = "supernodal"
            return
        Ap = A[self.perm][:, self.perm]
        if self.mode == "dense":
            Ad = jnp.asarray(Ap.toarray(), dtype=dtype)
            self.L = jnp.linalg.cholesky(Ad)
            ok = bool(jnp.all(jnp.isfinite(self.L)))
        else:
            n_pad = self.nb * self.m
            if n_pad > self.n:
                Ap = sp.bmat(
                    [[Ap, None],
                     [None, sp.identity(n_pad - self.n, format="csr")]],
                    format="csr",
                )
            m, nb = self.m, self.nb
            diag = np.zeros((nb, m, m))
            sub = np.zeros((nb, m, m))
            Ab = sp.bsr_matrix(Ap, blocksize=(m, m))
            Ab.sort_indices()
            for k in range(nb):
                for pos in range(Ab.indptr[k], Ab.indptr[k + 1]):
                    j = Ab.indices[pos]
                    if j == k:
                        diag[k] = Ab.data[pos]
                    elif j == k - 1:
                        sub[k - 1] = Ab.data[pos]
                    elif abs(j - k) > 1:
                        raise RuntimeError(
                            "matrix is not block-tridiagonal under the analyzed "
                            "pattern — call analyze_pattern() for the new pattern"
                        )
            L_diag, L_sub = _block_tridiag_cholesky(
                jnp.asarray(diag, dtype=dtype), jnp.asarray(sub, dtype=dtype)
            )
            self.L = (L_diag, L_sub)
            ok = bool(jnp.all(jnp.isfinite(L_diag)))
        if not ok:
            # reference: factorize throws on Eigen::NumericalIssue
            # (EigenSolver.tpp:44-52) / Pardiso error codes (Pardiso.cpp:249-252)
            raise RuntimeError(f"{self.name()}: numerical issue (matrix not SPD?)")

    def _solve_once(self, B: np.ndarray) -> np.ndarray:
        """One factor-solve pass for (n, k) rhs, float64 in/out."""
        dtype = default_dtype()
        if self.mode == "supernodal":
            return self.snl.solve(B)
        Bp = B[self.perm]
        if self.mode == "dense":
            y = jax.scipy.linalg.solve_triangular(
                self.L, jnp.asarray(Bp, dtype=dtype), lower=True)
            Xp = jax.scipy.linalg.solve_triangular(self.L.T, y, lower=False)
            Xp = np.asarray(Xp, dtype=np.float64)
        else:
            n_pad = self.nb * self.m
            Bpad = np.zeros((n_pad, B.shape[1]))
            Bpad[: self.n] = Bp
            Bblocks = jnp.asarray(
                Bpad.reshape(self.nb, self.m, -1), dtype=dtype
            )
            X = _block_tridiag_solve(self.L[0], self.L[1], Bblocks)
            Xp = np.asarray(X, dtype=np.float64).reshape(n_pad, -1)[: self.n]
        out = np.empty_like(Bp)
        out[self.perm] = Xp
        return out

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        if self.L is None:
            raise RuntimeError("factorize() must be called before solve()")
        b = np.asarray(b, dtype=np.float64)
        squeeze = b.ndim == 1
        B = b.reshape(self.n, -1)
        X = self._solve_once(B)
        # fp32 factorization → iterative refinement to fp64 accuracy: the
        # residual is float64 host work (O(nnz)), each correction reuses the
        # device factor (SURVEY.md §7 hard-part #4)
        if default_dtype() == jnp.float32:
            for _ in range(int(self.params.get("max_refine_iter", 4))):
                R = B - self.A_host @ X
                if np.linalg.norm(R) <= 1e-14 * max(np.linalg.norm(B), 1e-300):
                    break
                X = X + self._solve_once(R)
        return X[:, 0] if squeeze else X

    def get_info(self) -> Dict[str, Any]:
        info = {
            "solver": self.name(),
            "mode": self.mode,
            "band_block": self.m,
            "num_blocks": self.nb,
        }
        if self.mode == "supernodal" and self.snl is not None and self.snl.sym:
            s = self.snl.sym
            info.update(tile=s.m, n_block_cols=s.nb, n_blocks=s.n_blocks,
                        factor_mem_mb=round(s.mem_blocks_mb, 2),
                        factor_flops=s.flops)
        elif self.L is not None and self.mode in ("band", "dense"):
            info["mem_factor_mb"] = float(
                sum(np.asarray(l).nbytes for l in
                    (self.L if isinstance(self.L, tuple) else (self.L,))) / 2**20)
        return info


@register_solver(
    "SparseLU",
    aliases=["Eigen::SparseLU", "Eigen::UmfPackLU", "Eigen::SuperLU",
             "Eigen::PardisoLU"],
)
class SparseLUSolver(Solver):
    """General (non-SPD) sparse direct solve (reference Eigen::SparseLU /
    UmfPack / SuperLU role, Solver.cpp:316-366).

    Large sparse systems take the blocked supernodal LU (symmetric-pattern
    fill, block-diagonal pivoting — linear/supernodal.py); every ``solve``
    runs float64 iterative refinement and falls back to a dense fully-pivoted
    LU if the restricted pivoting was numerically inadequate (the honest
    answer to Eigen::SparseLU's full pivoting without sacrificing the
    device-resident fast path). Tiny systems go straight to dense."""

    min_sparse_n = 256
    fallback_tol = 1e-8  # refined relative residual above this → dense

    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        return {
            "mode": {"type": "string", "default": "auto"},
            "tile": {"type": "int", "default": 32},
            "max_refine_iter": {"type": "int", "default": 6},
        }

    def __init__(self):
        super().__init__()
        self.factors = None          # dense (lu, piv) or "supernodal"
        self.snl = None
        self.A_host: Optional[sp.csr_matrix] = None
        self.n = 0
        self.mode = "dense"

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        self.n = A.shape[0]
        requested = str(self.params.get("mode", "auto"))
        if requested != "auto":
            self.mode = requested
        else:
            self.mode = ("supernodal"
                         if sp.issparse(A) and self.n > self.min_sparse_n
                         else "dense")
        if self.mode == "supernodal":
            from polysolve_tpu.linear.supernodal import SupernodalLU

            self.snl = SupernodalLU(tile=int(self.params.get("tile", 32)))
            self.snl.analyze(sp.csr_matrix(A))

    def _factorize_dense(self, A: sp.spmatrix) -> None:
        Ad = jnp.asarray(A.toarray(), dtype=default_dtype())
        self.factors = jax.scipy.linalg.lu_factor(Ad)
        self.mode = "dense"
        if not bool(jnp.all(jnp.isfinite(self.factors[0]))):
            raise RuntimeError(f"{self.name()}: numerical issue during factorization")

    def factorize(self, A) -> None:
        A = sp.csr_matrix(A) if sp.issparse(A) else sp.csr_matrix(np.asarray(A))
        if self.n != A.shape[0] or (self.mode == "supernodal" and self.snl is None):
            self.analyze_pattern(A)
        self.A_host = A
        if self.mode == "supernodal":
            try:
                self.snl.factorize(A)
                self.factors = "supernodal"
                return
            except RuntimeError:
                self.logger.warning(
                    "%s: blocked LU hit a zero pivot; dense fallback", self.name())
        self._factorize_dense(A)

    def _solve_once(self, B: np.ndarray) -> np.ndarray:
        if self.mode == "supernodal":
            return self.snl.solve(B)
        bd = jnp.asarray(B, dtype=default_dtype())
        return np.asarray(jax.scipy.linalg.lu_solve(self.factors, bd),
                          dtype=np.float64)

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        if self.factors is None:
            raise RuntimeError("factorize() must be called before solve()")
        b = np.asarray(b, dtype=np.float64)
        squeeze = b.ndim == 1
        B = b.reshape(self.n, -1)
        X = self._solve_once(B)
        bnorm = max(np.linalg.norm(B), 1e-300)
        relres = np.inf
        for _ in range(int(self.params.get("max_refine_iter", 6))):
            R = B - self.A_host @ X
            relres = np.linalg.norm(R) / bnorm
            if relres <= 1e-14 or not np.all(np.isfinite(X)):
                break
            X = X + self._solve_once(R)
        if self.mode == "supernodal" and (
                not np.all(np.isfinite(X)) or relres > self.fallback_tol):
            # restricted pivoting was not enough for this matrix
            self.logger.warning(
                "%s: blocked LU refinement stalled at %.2e; dense fallback",
                self.name(), relres)
            self._factorize_dense(self.A_host)
            X = self._solve_once(B)
        return X[:, 0] if squeeze else X

    def get_info(self) -> Dict[str, Any]:
        info = {"solver": self.name(), "n": self.n, "mode": self.mode}
        if self.mode == "supernodal" and self.snl is not None and self.snl.sym:
            s = self.snl.sym
            info.update(tile=s.m, n_blocks=s.n_blocks,
                        factor_mem_mb=round(2 * s.mem_blocks_mb, 2))
        return info


@register_solver("SparseQR", aliases=["Eigen::SparseQR", "Eigen::SPQR"])
class SparseQRSolver(Solver):
    """True sparse QR by corrected semi-normal equations (CSNE) — the
    scalable replacement for the round-2 densified col-piv QR alias
    (VERDICT r2 missing #4; reference Eigen::SparseQR / SuiteSparseQR,
    Solver.cpp:320-324, :369-372 with the SPQR compute() override
    Solver.cpp:37-51).

    The upper-triangular factor of A = QR satisfies RᵀR = AᵀA, so R comes
    from the supernodal sparse Cholesky of the normal matrix — O(nnz(R))
    memory, no densification, and the whole numeric phase is the existing
    batched MXU scan (supernodal.py). Q is never formed ("Q-less" QR,
    Björck's CSNE): solves run x = R⁻¹R⁻ᵀ(Aᵀb) followed by one or two
    fp64 least-squares-residual corrections, which restores the accuracy
    the squared condition number costs. Works for square systems and
    rectangular least squares (rows ≥ cols); a rank-deficient normal matrix
    fails to factor and falls back to a dense rank-revealing col-piv QR
    below ``dense_fallback_n`` (or raises beyond it, like SPQR on
    out-of-memory)."""

    dense_fallback_n = 2048

    @classmethod
    def param_tree(cls) -> Dict[str, Any]:
        return {
            "tile": {"type": "int", "default": 32},
            "max_refine_iter": {"type": "int", "default": 3},
        }

    def __init__(self):
        super().__init__()
        self.A_host: Optional[sp.csr_matrix] = None
        self.snl = None
        self._dense_qr = None
        self.n = 0

    def analyze_pattern(self, A: sp.spmatrix, precond_num: int = 0) -> None:
        # symbolic work happens on the normal matrix inside factorize (its
        # pattern derives from A's; the supernodal cache keys on it)
        self.n = A.shape[1]

    def _normal_matrix(self, A: sp.csr_matrix) -> sp.csr_matrix:
        from polysolve_tpu import native

        At = native.csr_transpose(sp.csr_matrix(A))
        if At is None:
            At = sp.csr_matrix(A.T)
        C = native.spgemm(At, sp.csr_matrix(A))
        if C is None:
            C = sp.csr_matrix(At @ A)
        return sp.csr_matrix(C)

    def factorize(self, A: sp.spmatrix) -> None:
        from polysolve_tpu.linear.supernodal import SupernodalCholesky

        A = sp.csr_matrix(A)
        if A.shape[0] < A.shape[1]:
            raise RuntimeError("SparseQR: underdetermined systems "
                               "(rows < cols) are not supported")
        self.A_host = A
        self.n = A.shape[1]
        self._dense_qr = None
        C = self._normal_matrix(A)
        tile = int(self.params.get("tile", 32))
        if self.snl is None or self.snl.tile != tile:
            self.snl = SupernodalCholesky(tile=tile)
        try:
            self.snl.factorize(C)
            return
        except RuntimeError:
            pass
        if self.n <= self.dense_fallback_n:
            # rank-revealing dense fallback (the SPQR role on deficiency)
            import jax.numpy as jnp

            Ad = jnp.asarray(A.toarray())
            self._dense_qr = jnp.linalg.qr(Ad, mode="reduced")
            return
        raise RuntimeError(
            "SparseQR: normal matrix not positive definite (rank-deficient "
            f"A?) and n={self.n} exceeds the dense fallback cap")

    def solve(self, b: np.ndarray, x: Optional[np.ndarray] = None) -> np.ndarray:
        if self.A_host is None:
            raise RuntimeError("factorize() must be called before solve()")
        import jax
        import jax.numpy as jnp

        A = self.A_host
        b = np.asarray(b, dtype=np.float64)
        squeeze = b.ndim == 1
        B = b.reshape(A.shape[0], -1)
        if self._dense_qr is not None:
            Q, R = self._dense_qr
            X = jax.scipy.linalg.solve_triangular(
                R, Q.T @ jnp.asarray(B), lower=False)
            X = np.asarray(X, dtype=np.float64)
            return X[:, 0] if squeeze else X
        # CSNE: x0 = (RᵀR)⁻¹ Aᵀ b, then correct with the true LS residual
        X = np.asarray(self.snl.solve(A.T @ B), dtype=np.float64).reshape(
            self.n, -1)
        best = np.inf
        for _ in range(int(self.params.get("max_refine_iter", 3))):
            R64 = B - A @ X
            g = A.T @ R64                      # LS optimality residual Aᵀr
            gn = np.linalg.norm(g)
            if not np.isfinite(gn) or gn >= best * 0.5:
                break
            best = gn
            X = X + np.asarray(self.snl.solve(g),
                               dtype=np.float64).reshape(self.n, -1)
        return X[:, 0] if squeeze else X

    def get_info(self) -> Dict[str, Any]:
        return {"solver": self.name(), "n": self.n,
                "mode": "dense_qr" if self._dense_qr is not None
                else "csne_supernodal"}
