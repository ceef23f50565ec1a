"""Per-stage timing of the unstructured BLOCK-path AMG-PCG at 1M rows:
the e2e warm solve measured ~190 ms/inner-iteration — find where it goes
(A matvec 1.0 ms is known; suspects: P/R transfer ops, the 63k scalar-tile
level, the dense 3.3k level, per-iteration overheads). Chained-fori
device timing throughout. Results → amg_block_cycle_results.jsonl."""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

OUT = "/root/repo/experiments/amg_block_cycle_results.jsonl"
CHAIN = 20


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res), flush=True)


def timed_chain(fn, operands, x0, label, chain=CHAIN):
    """fn: (operands, x) -> x (same shape); chained fori with scalar
    readback. Operands are jit ARGUMENTS — closing over them embeds
    hundreds of MB as HLO constants and the remote compile helper rejects
    the body with HTTP 413 (axon measurement rules)."""
    @jax.jit
    def run(ops_tree, x):
        def body(i, x):
            return fn(ops_tree, x) * jnp.float32(0.5)
        x = jax.lax.fori_loop(0, chain, body, x)
        return jnp.vdot(x[:128], x[:128])

    t0 = time.perf_counter()
    float(run(operands, x0))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(operands, x0))
        best = min(best, time.perf_counter() - t0)
    log({"sec": "stage", "label": label,
         "ms_per_apply": round(best * 1e3 / chain, 3),
         "compile_s": round(compile_s, 1)})
    return best / chain


def main():
    from tile_ell_tpu import build_matrix

    from polysolve_tpu.linear import Solver, amg
    from polysolve_tpu.linear.iterative import _run_krylov
    from polysolve_tpu import ops

    A = build_matrix(70)
    n = A.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    s = Solver.create({
        "solver": "AMG",
        "AMG": {"tolerance": 1e-8, "max_iter": 400, "block_size": 3,
                "structured": False, "relax_degree": 3},
    }, strict=False)
    t0 = time.perf_counter()
    s.analyze_pattern(A)
    s.factorize(A)
    log({"sec": "setup", "setup_s": round(time.perf_counter() - t0, 1),
         "levels": s._hier.level_sizes,
         "A_dev": type(s.A_dev).__name__})

    state = s.pstate
    n_pad = s._planar["n_pad"] if s._planar else n
    r0 = jnp.asarray(np.random.default_rng(1).standard_normal(n_pad),
                     jnp.float32)

    # stage probes (operators passed as jit arguments, never closed over)
    timed_chain(lambda M, x: ops.matvec(M, x), s.A_dev, r0,
                "A_matvec_block")
    lev0 = state.levels[0]
    timed_chain(lambda L, x: amg._smooth(L, x), lev0, r0, "L0_smooth")
    nc1 = state.levels[1].A.shape[0] if state.levels[1].A is not None else 0
    timed_chain(lambda L, x: amg._p_apply(L, amg._r_apply(L, x)[: nc1]),
                lev0, r0, "L0_R_then_P")
    r1 = jnp.asarray(np.random.default_rng(2).standard_normal(nc1),
                     jnp.float32)
    lev1 = state.levels[1]
    timed_chain(lambda L, x: ops.matvec(L.A, x), lev1, r1, "L1_matvec")
    timed_chain(lambda L, x: amg._smooth(L, x), lev1, r1, "L1_smooth")
    timed_chain(lambda st, x: amg.cycle(st, x, start=1)[: nc1], state, r1,
                "cycle_from_L1")
    timed_chain(lambda st, x: amg.cycle(st, x), state, r0, "full_cycle")

    # device iteration rate: fixed-iteration differential on the same
    # compiled while_loop
    b_dev = jnp.zeros(n_pad, jnp.float32).at[
        jnp.asarray(s._planar["inv"]) if s._planar else jnp.arange(n)
    ].set(jnp.asarray(b, jnp.float32))
    x0 = jnp.zeros_like(b_dev)
    zero = jnp.asarray(0.0, jnp.float32)

    def timed_cg(k):
        best, done = 1e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            res = _run_krylov("CG", s.A_dev, state, b_dev, x0, zero,
                              jnp.int32(k), atol=zero)
            float(res.error)
            best = min(best, time.perf_counter() - t0)
            done = int(res.iterations)
        return best, done

    timed_cg(5)
    (t1, k1), (t2, k2) = timed_cg(5), timed_cg(45)
    if t2 > t1 and k2 > k1:
        log({"sec": "pcg_rate", "device_ms_per_iter":
             round((t2 - t1) / (k2 - k1) * 1e3, 2),
             "iters": [k1, k2]})


if __name__ == "__main__":
    main()
