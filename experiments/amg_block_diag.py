"""Diagnose the block-3 coarse-level coupling statistics: at each level,
report the distribution of |An_ij| / sqrt(An_ii·An_jj) on the condensed node
graph — is the Vaněk threshold test the right shape, or do diagonals
dominate so hard that every pair looks weak?"""

import sys

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def node_stats(A, bs, name):
    n = A.shape[0]
    nb = n // bs
    C = sp.coo_matrix(A)
    br, bc = C.row // bs, C.col // bs
    An = sp.csr_matrix((np.abs(C.data), (br, bc)), shape=(nb, nb))
    dn = An.diagonal()
    dn = np.where(dn > 0, dn, 1.0)
    Anc = An.tocoo()
    off = Anc.row != Anc.col
    ratio = Anc.data[off] / np.sqrt(dn[Anc.row[off]] * dn[Anc.col[off]])
    # row-max relative ratio
    M = sp.csr_matrix((Anc.data[off], (Anc.row[off], Anc.col[off])),
                      shape=(nb, nb))
    rowmax = M.max(axis=1).toarray().ravel()
    print(f"{name}: n={n} nb={nb} deg={M.nnz/max(nb,1):.1f} "
          f"ratio q10/50/90/max="
          f"{np.percentile(ratio, [10, 50, 90]).round(4).tolist()}"
          f"/{ratio.max():.4f} rowmax_med={np.median(rowmax):.4f}")


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.linear import amg

    A = build_matrix(30)
    bs = 3
    Bl = amg._initial_nullspace(A.shape[0], bs, None)
    Al = sp.csr_matrix(A).astype(np.float64)
    eps = 0.08
    for lvl in range(6):
        node_stats(Al, bs, f"L{lvl}(eps={eps:.4f})")
        agg, n_agg = amg._aggregate(Al, eps, bs)
        if n_agg >= 0.95 * Al.shape[0] // bs * bs:
            print("  (stall)")
        d = Al.diagonal()
        d = np.where(d != 0, d, 1.0)
        P_tent, Bc, uniform = amg._tentative_prolongator(agg, n_agg, Bl)
        Af = amg._filtered_matrix(Al, eps, bs)
        df_ = Af.diagonal()
        df_ = np.where(df_ != 0, df_, 1.0)
        DAf = Af.copy()
        DAf.data = DAf.data / np.repeat(df_, np.diff(Af.indptr))
        rho_f = amg._spectral_radius_host(DAf)
        P, w = amg._smooth_prolongator(Al, P_tent, 4.0 / 3.0, rho_da=rho_f,
                                       DA=DAf)
        R = sp.csr_matrix(P.T)
        Ac = sp.csr_matrix(R @ Al @ P)
        Ac.eliminate_zeros()
        print(f"  agg ratio={Al.shape[0] / max(n_agg * Bc.shape[1], 1):.2f} "
          f"uniform={uniform} coarse n={Ac.shape[0]} nnz={Ac.nnz}")
        Al, Bl = Ac, Bc
        bs = Bc.shape[1] if uniform else 1
        eps *= 0.5
        if Al.shape[0] <= 500:
            break


if __name__ == "__main__":
    main()
