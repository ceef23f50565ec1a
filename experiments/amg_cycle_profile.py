"""Profile the AMG cycle per component on the TPU (VERDICT r2 next-step #3:
find where 0.46 s/device-iteration at n=7.08M goes — the fine matvec is
~0.6 ms, so the cycle is paying far more than the sum of its parts should).

Probe design (all honest under the axon tunnel — CLAUDE.md measurement
rules: chained fori_loop ending in a scalar, loop-dependent carry so XLA
cannot hoist the body):

  - ``cycle_from_L{l}``: a full cycle STARTED at level l (same-shape carry).
    The difference cycle_from_L{l} − cycle_from_L{l+1} is level l's own
    cost (smooths + matvecs + transfers) — an additive decomposition that
    needs no shape-changing probes.
  - per-level matvec / smoother (same-shape).
  - ``L{l}_transfer_pair``: restrict∘prolong on the coarse vector
    (same-shape composition — prolong/restrict cannot be chained alone).
  - ``coarse_inv_mv``: the coarsest dense-inverse matvec.
  - ``fine_dot_scale`` / ``fine_axpy``: n-sized CG-iteration overhead unit.

Usage: python experiments/amg_cycle_profile.py [m] [chain]   (default 192 10)
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import scipy.sparse as sp  # noqa: E402

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/experiments/amg_cycle_profile_results.jsonl"
M = int(sys.argv[1]) if len(sys.argv) > 1 else 192
CHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def log(res):
    res["experiment"] = "amg_cycle_profile"
    res["m"] = M
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def timed(name, fn, x, extra=None, op=None):
    """fn: (op, x) -> array of the SAME shape as x; chained CHAIN times with
    the full array as carry (loop-dependent — hoisting-safe), scalar
    readback. ``op`` (any pytree: the AMG state / a level) is passed as a
    jit ARGUMENT — closing over it embeds hundreds of MB of level data as
    HLO constants, which the remote compile helper rejects (HTTP 413)."""

    @jax.jit
    def chain(op, x):
        def body(i, x):
            y = fn(op, x)
            # renormalize so the chain neither under- nor overflows
            return y / jnp.maximum(jnp.sqrt(jnp.vdot(y[:128], y[:128])),
                                   jnp.float32(1e-30))

        x = jax.lax.fori_loop(0, CHAIN, body, x)
        return jnp.vdot(x[:128], x[:128])

    try:
        t0 = time.perf_counter()
        float(chain(op, x))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(chain(op, x))
            best = min(best, time.perf_counter() - t0)
        rec = {"component": name, "ms_per_apply": round(best * 1e3 / CHAIN, 3),
               "compile_s": round(compile_s, 1)}
        if extra:
            rec.update(extra)
        log(rec)
    except Exception as e:  # keep profiling the rest
        log({"component": name, "error": repr(e)[:200]})


def main():
    from polysolve_tpu.linear import Solver
    from polysolve_tpu.linear import amg as amg_mod
    from polysolve_tpu.ops import spmv as ops

    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(M, M))
    I = sp.identity(M, dtype=np.float64)
    A = sp.csr_matrix(
        sp.kron(sp.kron(I, I), T) + sp.kron(sp.kron(I, T), I)
        + sp.kron(sp.kron(T, I), I))
    n = A.shape[0]
    print("n", n, "nnz", A.nnz, flush=True)

    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 200, "coarse_enough": 2000,
                "max_levels": 6, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    log({"component": "setup", "ms_per_apply": None,
         "setup_s": round(time.perf_counter() - t0, 1)})
    state = s.pstate

    rng = np.random.default_rng(0)
    nlev = len(state.levels)
    fmts = [type(lev.A).__name__ for lev in state.levels]
    log({"component": "hierarchy",
         "sizes": [int(lev.A.shape[0]) for lev in state.levels]
         + [int(state.coarse_inv.shape[0])],
         "fmts": fmts})

    # additive decomposition: cycle started at each level
    for l in range(nlev):
        nl = state.levels[l].A.shape[0]
        xl = jnp.asarray(rng.standard_normal(nl), jnp.float32)
        timed(f"cycle_from_L{l}",
              lambda st, x, l=l: amg_mod.cycle(st, x, start=l), xl,
              {"n": int(nl)}, op=state)

    for l, lev in enumerate(state.levels):
        nl = lev.A.shape[0]
        xl = jnp.asarray(rng.standard_normal(nl), jnp.float32)
        K = len(lev.A.offsets) if hasattr(lev.A, "offsets") else -1
        timed(f"L{l}_matvec", lambda lv, x: ops.matvec(lv.A, x), xl,
              {"n": int(nl), "K": K, "fmt": type(lev.A).__name__}, op=lev)
        timed(f"L{l}_smooth", lambda lv, x: amg_mod._smooth(lv, x), xl,
              op=lev)
        nc = (state.levels[l + 1].A.shape[0] if l + 1 < nlev
              else state.coarse_inv.shape[0])
        xc = jnp.asarray(rng.standard_normal(nc), jnp.float32)
        timed(f"L{l}_transfer_pair",
              lambda lv, x: amg_mod._r_apply(lv, amg_mod._p_apply(lv, x)),
              xc, {"n_coarse": int(nc)}, op=lev)

    ncoarse = state.coarse_inv.shape[0]
    xc = jnp.asarray(rng.standard_normal(ncoarse), jnp.float32)
    timed("coarse_inv_mv",
          lambda ci, x: jnp.dot(ci, x, preferred_element_type=x.dtype), xc,
          {"n": int(ncoarse)}, op=state.coarse_inv)

    # CG-iteration overhead units at fine n
    xf = jnp.asarray(rng.standard_normal(n), jnp.float32)
    timed("fine_dot_scale",
          lambda o, x: x / jnp.sqrt(jnp.vdot(x, x) + 1.0), xf, op=())
    timed("fine_axpy", lambda o, x: x * jnp.float32(0.999) + o, xf, op=xf)


if __name__ == "__main__":
    main()
