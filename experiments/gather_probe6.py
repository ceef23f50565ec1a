"""Probe the composite tile-ELL inner loop at realistic VMEM footprints.

Variants (K chunks per call, CHAIN calls chained):
  cr128 — chunk = 128 slot-rows: slice(128,128) + subgather + crossbar + fma
  cr32  — chunk = 32 slot-rows: slice + idx padded to (128,128) for the
          subgather, (32,128) crossbar + fma; q/r stored int8
Usage: python experiments/gather_probe6.py [cpu|tpu]
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
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

OUT = "/root/repo/experiments/gather_probe_results.jsonl"
INTERPRET = MODE == "cpu"
CHAIN = 50
W = 1024


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def run(CR, K):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
    wb = jnp.asarray(rng.integers(0, (W - 128) // 8, size=(K,)) * 8, jnp.int32)
    q = jnp.asarray(rng.integers(0, 128, size=(K * CR, 128)), jnp.int8)
    r = jnp.asarray(rng.integers(0, 128, size=(K * CR, 128)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((K * CR, 128)) * 0.01, jnp.float32)

    def kernel(x_ref, wb_ref, q_ref, r_ref, v_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            X = x_ref[pl.ds(wb_ref[k], 128), :]
            q32 = q_ref[k * CR:(k + 1) * CR, :].astype(jnp.int32)
            if CR < 128:
                qpad = jnp.concatenate(
                    [q32, jnp.zeros((128 - CR, 128), jnp.int32)], axis=0)
            else:
                qpad = q32
            src = jnp.take_along_axis(X, qpad, axis=0)[:CR]
            g = jnp.take_along_axis(
                src, r_ref[k * CR:(k + 1) * CR, :].astype(jnp.int32), axis=1)
            p = v_ref[k * CR:(k + 1) * CR, :] * g
            acc = acc + p.reshape(CR // 8, 8, 128).sum(axis=0)
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(x, wb, q, r, v):
        def body(i, acc):
            return acc + f(x + acc[0, 0] * 1e-30, wb, q, r, v)
        acc = jax.lax.fori_loop(0, CHAIN, body,
                                jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(x, wb, q, r, v))
        compile_s = time.perf_counter() - t0
        xn, wbn, qn, rn, vn = map(np.asarray, (x, wb, q, r, v))
        acc = np.zeros((8, 128), np.float32)
        for k in range(K):
            X = xn[wbn[k]:wbn[k] + 128]
            src = np.take_along_axis(
                X, qn[k * CR:(k + 1) * CR].astype(np.int64), axis=0)
            g = np.take_along_axis(
                src, rn[k * CR:(k + 1) * CR].astype(np.int64), axis=1)
            acc += (vn[k * CR:(k + 1) * CR] * g).reshape(
                CR // 8, 8, 128).sum(axis=0)
        expect = CHAIN * acc.sum()
        ok = abs(out - expect) < 1e-2 * max(1.0, abs(expect))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x, wb, q, r, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * CR * 128 / best / 1e9
        log({"probe": f"p6_cr{CR}_K{K}", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"p6_cr{CR}_K{K}", "error": repr(e)[:300]})


run(128, 8)
run(32, 32)
run(32, 8)
