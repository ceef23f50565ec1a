"""Probe the (128,128)-chunk tile-ELL inner loop: one dynamic 128-row window
slice + equal-shape sublane gather (row-broadcast indices) + lane crossbar.

Per chunk: 16384 slots. K chunks/call, CHAIN calls chained.
Variants:
  c128      — the full pattern
  c128_take — jnp.take with 1-D row indices instead of broadcast
              take_along_axis for the row select
  c128_noslice — no window slice (wb=0 static) to isolate slice cost

Usage: python experiments/gather_probe5.py [cpu|tpu]
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
CHAIN = 20
K = 64
W = 4096


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def make_kernel(variant):
    def kernel(x_ref, wb_ref, q_ref, r_ref, v_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.float32)
        for k in range(K):
            wb = wb_ref[k] if variant != "c128_noslice" else 0
            X = x_ref[pl.ds(wb, 128), :]
            qk = q_ref[k * 128:(k + 1) * 128, :]
            if variant == "c128_take":
                src = jnp.take(X, qk[:, 0], axis=0)
            else:
                src = jnp.take_along_axis(X, qk, axis=0)
            g = jnp.take_along_axis(
                src, r_ref[k * 128:(k + 1) * 128, :], axis=1)
            acc = acc + v_ref[k * 128:(k + 1) * 128, :] * g
        o_ref[:] = acc
    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
    wb = jnp.asarray(rng.integers(0, W - 128, size=(K,)), jnp.int32)
    q = np.broadcast_to(
        rng.integers(0, 128, size=(K * 128, 1)), (K * 128, 128)).copy()
    q = jnp.asarray(q, jnp.int32)
    r = jnp.asarray(rng.integers(0, 128, size=(K * 128, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 128, 128)) * 0.01, jnp.float32)

    f = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
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
                                jnp.zeros((128, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(x, wb, q, r, v))
        compile_s = time.perf_counter() - t0
        # correctness
        xn, wbn, qn, rn, vn = map(np.asarray, (x, wb, q, r, v))
        acc = np.zeros((128, 128), np.float32)
        for k in range(K):
            b0 = 0 if variant == "c128_noslice" else wbn[k]
            X = xn[b0:b0 + 128]
            src = X[qn[k * 128:(k + 1) * 128, 0]]
            g = np.take_along_axis(src, rn[k * 128:(k + 1) * 128], axis=1)
            acc += vn[k * 128:(k + 1) * 128] * g
        expect = CHAIN * acc.sum()
        ok = abs(out - expect) < 1e-2 * max(1.0, abs(expect))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x, wb, q, r, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * 128 * 128 / best / 1e9
        log({"probe": f"p5_{variant}", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"p5_{variant}", "error": repr(e)[:400]})


for variant in ("c128", "c128_take", "c128_noslice"):
    run(variant)
