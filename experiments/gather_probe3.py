"""Throughput probe for the tile-ELL SpMV inner loop, equal-shape gathers
only (Mosaic's take_along_axis lowers iff src.shape == idx.shape — unequal
extents die with a bare AssertionError at lowering; see gather_min.py).

Programs (kept few: each new shape is a ~minutes remote compile):
  1. xbar8:  chained (8,128)->(8,128) lane crossbar + fma
  2. chunk8: the real inner loop — 8 dynamic row slices from a (4096,128)
     VMEM window + concat + (8,128) crossbar + fma, K chunks per call
  3. xbar32: (32,128)->(32,128) lane crossbar + fma (wider chunks)

Usage: python experiments/gather_probe3.py [cpu|tpu]
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
CHAIN = 30


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def bench(name, f, args, ref_fn, elems_per_call):
    @jax.jit
    def chain(*a):
        def body(i, acc):
            return acc + f(a[0] + acc[0, 0] * 1e-30, *a[1:])
        acc = jax.lax.fori_loop(0, CHAIN, body,
                                jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        out = float(chain(*args))
        compile_s = time.perf_counter() - t0
        expect = CHAIN * ref_fn().sum()
        ok = abs(out - expect) < 1e-2 * max(1.0, abs(expect))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        log({"probe": name, "ok": bool(ok), "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3),
             "gelem_per_s": round(CHAIN * elems_per_call / best / 1e9, 2)})
    except Exception as e:
        log({"probe": name, "error": repr(e)[:400]})


def xbar(S, K):
    """K chained equal-shape (S,128) crossbars; output reduced to (8,128)."""
    def kernel(x_ref, r_ref, v_ref, o_ref):
        acc = jnp.zeros((S, 128), jnp.float32)
        for k in range(K):
            g = jnp.take_along_axis(
                x_ref[:], r_ref[k * S:(k + 1) * S, :], axis=1)
            acc = acc + v_ref[k * S:(k + 1) * S, :] * g
        o_ref[:] = acc[:8] + (acc[8:16] if S > 8 else 0.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    r = jnp.asarray(rng.integers(0, 128, size=(K * S, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * S, 128)), jnp.float32)
    f = pl.pallas_call(kernel,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       interpret=INTERPRET)

    def ref():
        acc = np.zeros((S, 128), np.float32)
        xn, rn, vn = map(np.asarray, (x, r, v))
        for k in range(K):
            g = np.take_along_axis(xn, rn[k * S:(k + 1) * S], axis=1)
            acc += vn[k * S:(k + 1) * S] * g
        return acc[:8] + (acc[8:16] if S > 8 else 0.0)

    bench(f"xbar{S}_K{K}", f, (x, r, v), ref, K * S * 128)


def chunk8(W, K):
    """The real tile-ELL inner loop: window (W,128) in VMEM; per chunk,
    8 scalar segment ids -> 8 dynamic row slices -> concat -> crossbar."""
    def kernel(x_ref, q_ref, r_ref, v_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            rows = [x_ref[pl.ds(q_ref[k * 8 + j], 1), :] for j in range(8)]
            src = jnp.concatenate(rows, axis=0)
            g = jnp.take_along_axis(src, r_ref[k * 8:(k + 1) * 8, :], axis=1)
            acc = acc + v_ref[k * 8:(k + 1) * 8, :] * g
        o_ref[:] = acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(0, W, size=(K * 8,)), jnp.int32)
    r = jnp.asarray(rng.integers(0, 128, size=(K * 8, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 8, 128)), jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar segment ids
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=INTERPRET,
    )

    def ref():
        acc = np.zeros((8, 128), np.float32)
        xn, qn, rn, vn = map(np.asarray, (x, q, r, v))
        for k in range(K):
            src = xn[qn[k * 8:(k + 1) * 8]]
            g = np.take_along_axis(src, rn[k * 8:(k + 1) * 8], axis=1)
            acc += vn[k * 8:(k + 1) * 8] * g
        return acc

    bench(f"chunk8_W{W}_K{K}", f, (x, q, r, v), ref, K * 8 * 128)


def main():
    xbar(8, 32)
    chunk8(4096, 32)
    xbar(32, 8)


if __name__ == "__main__":
    main()
