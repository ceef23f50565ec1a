"""Settle the roofline question (VERDICT r1 weak #1 / next-step #9): is the
~481 GB/s measured triad the real platform ceiling, or a harness artifact?

Measures, with the chained-fori_loop method, at several sizes:
  copy  : a = b·1         (2 streams)
  scale : a = 0.999·a     (2 streams, in-place pattern)
  triad : a = 0.999·a + b (3 streams)
  read2 : s += dot chunks (pure read)  — upper bound on read BW

Usage: python experiments/stream_ceiling.py
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

OUT = "/root/repo/experiments/stream_ceiling_results.jsonl"
CHAIN = 100


def log(res):
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def bench(name, fn, args, bytes_per_iter):
    f = jax.jit(fn)
    float(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    log({"probe": name, "run_ms": round(best * 1e3, 1),
         "GBps": round(CHAIN * bytes_per_iter / best / 1e9, 1)})


for logn in (24, 25, 26, 27, 28):
    ns = 1 << logn
    a = jnp.asarray(np.random.default_rng(1).standard_normal(ns), jnp.float32)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(ns), jnp.float32)
    mb = ns * 4 // 2**20

    def triad(a, b):
        def body(i, a):
            return a * jnp.float32(0.999) + b
        a = jax.lax.fori_loop(0, CHAIN, body, a)
        return jnp.vdot(a[:128], a[:128])

    def scale(a, b):
        def body(i, a):
            return a * jnp.float32(0.9999)
        a = jax.lax.fori_loop(0, CHAIN, body, a)
        return jnp.vdot(a[:128], a[:128])

    def copy2(a, b):
        # the loop carries the FULL array and each iteration's output
        # depends on the previous array's first element — the array write
        # cannot be elided and the read of b cannot be hoisted
        def body(i, a):
            return b + a[0] * jnp.float32(1e-30)
        a = jax.lax.fori_loop(0, CHAIN, body, a)
        return jnp.vdot(a[:128], a[:128])

    def read2(a, b):
        # per-iteration perturbation of the reduction operand blocks
        # loop-invariant hoisting (fp factoring is not a legal rewrite)
        def body(i, s):
            return jnp.vdot(a * (jnp.float32(1) + s * jnp.float32(1e-38)),
                            a) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    bench(f"triad_{mb}MB", triad, (a, b), 3 * 4 * ns)
    bench(f"scale_{mb}MB", scale, (a, b), 2 * 4 * ns)
    bench(f"copy_{mb}MB", copy2, (a, b), 2 * 4 * ns)
    bench(f"read_{mb}MB", read2, (a, b), 4 * ns)
    del a, b
