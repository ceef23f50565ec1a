"""Probe Mosaic tpu.dynamic_gather capabilities (via jnp.take_along_axis in
Pallas kernels) — the make-or-break primitive for an unstructured (ELL) SpMV
kernel on TPU.

Questions:
  1. Does lane-dim gather (axis=1) compile for source shapes (8, M) with
     M in {128, 512, 1024, 2048, 4096}? (multi-register gather)
  2. Does sublane-dim gather (axis=0) compile for (S, 128), S in {8, 32, 512}?
  3. Throughput: gathered elements / s for the winning config, measured with
     the chained-fori_loop trick (axon readback rules — see CLAUDE.md).

Usage:  python experiments/gather_probe.py cpu   # interpret mode semantics
        python experiments/gather_probe.py tpu   # real lowering + timing
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


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def gather_kernel(axis):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)
    return kernel


def probe(name, shape, axis, mod_wrap=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    M = shape[axis]
    hi = 3 * M if mod_wrap else M
    idx = jnp.asarray(rng.integers(0, hi, size=shape), jnp.int32)

    f = pl.pallas_call(
        gather_kernel(axis),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=INTERPRET,
    )
    try:
        t0 = time.perf_counter()
        out = np.asarray(jax.jit(f)(x, idx))
        dt = time.perf_counter() - t0
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx) % M, axis=axis)
        ok = bool(np.array_equal(out, ref))
        log({"probe": name, "shape": shape, "axis": axis, "ok": ok,
             "mod_ok": mod_wrap, "compile_s": round(dt, 1)})
        return ok
    except Exception as e:
        log({"probe": name, "shape": shape, "axis": axis,
             "error": repr(e)[:300]})
        return False


def throughput(shape, axis):
    """Chained gathers: out feeds nothing (indices static), so chain by
    accumulating; measure Gelem/s."""
    rng = np.random.default_rng(0)
    S, M = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, shape[axis], size=shape), jnp.int32)
    K_CHAIN = 100

    def body_kernel(x_ref, idx_ref, o_ref):
        g = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)
        o_ref[:] = g * 0.999 + x_ref[:]

    f = pl.pallas_call(
        body_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(x, idx):
        def body(i, x):
            return f(x, idx)
        x = jax.lax.fori_loop(0, K_CHAIN, body, x)
        return jnp.vdot(x[0, :128], x[0, :128])

    try:
        t0 = time.perf_counter()
        float(chain(x, idx))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x, idx))
            best = min(best, time.perf_counter() - t0)
        gelems = K_CHAIN * S * M / best / 1e9
        log({"probe": "throughput", "shape": shape, "axis": axis,
             "compile_s": round(compile_s, 1), "run_ms": round(best * 1e3, 3),
             "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": "throughput", "shape": shape, "axis": axis,
             "error": repr(e)[:300]})


def main():
    # lane gather (axis=1)
    probe("lane_128", (8, 128), 1)
    probe("lane_128_mod", (8, 128), 1, mod_wrap=True)
    probe("lane_512", (8, 512), 1)
    probe("lane_1024", (8, 1024), 1)
    probe("lane_2048", (8, 2048), 1)
    probe("lane_4096", (16, 4096), 1)
    probe("lane_1024_s32", (32, 1024), 1)
    # sublane gather (axis=0)
    probe("sub_8", (8, 128), 0)
    probe("sub_32", (32, 128), 0)
    probe("sub_512", (512, 128), 0)
    if MODE == "tpu":
        throughput((8, 1024), 1)
        throughput((32, 1024), 1)
        throughput((8, 4096), 1)
        throughput((256, 128), 1)


if __name__ == "__main__":
    main()
