"""TPU probe for the unstructured-SpMV gather strategies (round 2, VERDICT #1).

Candidate kernel inner loops for tile-ELL SpMV (rows on lanes, x window in
VMEM as (W/128, 128)):

  A. two_step: src = xwin[Q[k], :] (per-sublane-row segment select, Q constant
     across lanes) then g = take_along_axis(src, r, axis=1) (128-lane
     crossbar). Requires host packing where each slot-row shares one aligned
     128-segment of the x window.
  B. wide_lane: g = take_along_axis(xwin_bcast (8, W), idx (8,128), axis=1)
     with arbitrary idx in [0, W) — multi-vreg lane gather. No packing
     constraint; works iff Mosaic lowers big lane extents fast.
  C. sub_xbar: g = take_along_axis(xwin (S,128), q (8,128), axis=0) —
     arbitrary per-lane sublane gather (column-preserving). Only composable
     with mod-128 column packing (scatter on output), probed for completeness.

Timing per axon rules (CLAUDE.md): chain iterations inside one jitted
fori_loop ending in a scalar; read that scalar.

Usage: python experiments/gather_probe2.py [cpu|tpu]
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

OUT = "/root/repo/experiments/gather_probe_results.jsonl"
INTERPRET = MODE == "cpu"
CHAIN = 30          # fori_loop trips
INNER = 32          # gather chunks per trip (unrolled python loop in kernel)


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def two_step(K):
    """xwin (512,128); per chunk k: src = xwin[Q[k*8:(k+1)*8]], g = lane
    crossbar by r, acc += vals*g. K chunks of (8,128) slots."""
    def make():
        def kernel(xw_ref, Q_ref, r_ref, v_ref, o_ref):
            xw = xw_ref[:]
            acc = jnp.zeros((8, 128), jnp.float32)
            for k in range(K):
                q = Q_ref[k * 8:(k + 1) * 8, :]          # (8,128) bcast rows
                src = jnp.take_along_axis(xw[:, :], q, axis=0)
                g = jnp.take_along_axis(src, r_ref[k * 8:(k + 1) * 8, :], axis=1)
                acc = acc + v_ref[k * 8:(k + 1) * 8, :] * g
            o_ref[:] = acc
        return kernel

    # Q must be constant across lanes (per-slot-row segment index)
    Q = np.random.default_rng(1).integers(0, 512, size=(K * 8, 1))
    Qb = np.broadcast_to(Q, (K * 8, 128)).copy()
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    r = jnp.asarray(rng.integers(0, 128, size=(K * 8, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 8, 128)), jnp.float32)
    Qj = jnp.asarray(Qb, jnp.int32)

    f = pl.pallas_call(
        make(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(xw, Qj, r, v):
        def body(i, acc):
            return acc + f(xw + acc[0, 0] * 1e-30, Qj, r, v)
        acc = jax.lax.fori_loop(0, CHAIN, body, jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(xw, Qj, r, v))
        compile_s = time.perf_counter() - t0
        # correctness vs numpy
        accn = np.zeros((8, 128), np.float32)
        xwn = np.asarray(xw)
        for k in range(K):
            src = xwn[np.asarray(Qb[k * 8:(k + 1) * 8, 0])]
            g = np.take_along_axis(src, np.asarray(r[k * 8:(k + 1) * 8]), axis=1)
            accn += np.asarray(v[k * 8:(k + 1) * 8]) * g
        ok = abs(out - CHAIN * accn.sum()) < 1e-2 * max(1.0, abs(CHAIN * accn.sum()))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(xw, Qj, r, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * 8 * 128 / best / 1e9
        log({"probe": f"two_step_K{K}", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"two_step_K{K}", "error": repr(e)[:400]})


def wide_lane(W, K):
    """xwin broadcast (8, W); per chunk: g = take_along_axis(xw, idx, axis=1),
    idx (8,128) arbitrary in [0,W)."""
    def make():
        def kernel(xw_ref, idx_ref, v_ref, o_ref):
            xw = xw_ref[:]
            acc = jnp.zeros((8, 128), jnp.float32)
            for k in range(K):
                g = jnp.take_along_axis(
                    xw, idx_ref[k * 8:(k + 1) * 8, :], axis=1)
                acc = acc + v_ref[k * 8:(k + 1) * 8, :] * g
            o_ref[:] = acc
        return kernel

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((8, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(K * 8, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 8, 128)), jnp.float32)

    f = pl.pallas_call(
        make(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(xw, idx, v):
        def body(i, acc):
            return acc + f(xw + acc[0, 0] * 1e-30, idx, v)
        acc = jax.lax.fori_loop(0, CHAIN, body, jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(xw, idx, v))
        compile_s = time.perf_counter() - t0
        accn = np.zeros((8, 128), np.float32)
        xwn, idxn, vn = np.asarray(xw), np.asarray(idx), np.asarray(v)
        for k in range(K):
            g = np.take_along_axis(xwn, idxn[k * 8:(k + 1) * 8], axis=1)
            accn += vn[k * 8:(k + 1) * 8] * g
        ok = abs(out - CHAIN * accn.sum()) < 1e-2 * max(1.0, abs(CHAIN * accn.sum()))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(xw, idx, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * 8 * 128 / best / 1e9
        log({"probe": f"wide_lane_W{W}_K{K}", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"wide_lane_W{W}_K{K}", "error": repr(e)[:400]})


def sub_xbar(S, K):
    """g[s,l] = xwin[q[s,l], l] — arbitrary per-lane sublane gather."""
    def make():
        def kernel(xw_ref, q_ref, v_ref, o_ref):
            xw = xw_ref[:]
            acc = jnp.zeros((8, 128), jnp.float32)
            for k in range(K):
                g = jnp.take_along_axis(
                    xw, q_ref[k * 8:(k + 1) * 8, :], axis=0)
                acc = acc + v_ref[k * 8:(k + 1) * 8, :] * g
            o_ref[:] = acc
        return kernel

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(0, S, size=(K * 8, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 8, 128)), jnp.float32)

    f = pl.pallas_call(
        make(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(xw, q, v):
        def body(i, acc):
            return acc + f(xw + acc[0, 0] * 1e-30, q, v)
        acc = jax.lax.fori_loop(0, CHAIN, body, jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(xw, q, v))
        compile_s = time.perf_counter() - t0
        accn = np.zeros((8, 128), np.float32)
        xwn, qn, vn = np.asarray(xw), np.asarray(q), np.asarray(v)
        for k in range(K):
            g = np.take_along_axis(xwn, qn[k * 8:(k + 1) * 8], axis=0)
            accn += vn[k * 8:(k + 1) * 8] * g
        ok = abs(out - CHAIN * accn.sum()) < 1e-2 * max(1.0, abs(CHAIN * accn.sum()))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(xw, q, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * 8 * 128 / best / 1e9
        log({"probe": f"sub_xbar_S{S}_K{K}", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"sub_xbar_S{S}_K{K}", "error": repr(e)[:400]})


def main():
    two_step(INNER)
    wide_lane(1024, INNER)
    wide_lane(4096, INNER)
    wide_lane(16384, INNER)
    sub_xbar(512, INNER)
    sub_xbar(64, INNER)


if __name__ == "__main__":
    main()
