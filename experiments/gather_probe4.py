"""Big-workload gather throughput: isolate crossbar cost from dispatch
overhead (probe3's 23ms was latency-dominated — identical across variants).

Variants (K=512 chunks of (8,128) slots per call, CHAIN=20 calls chained):
  full    — 8 dynamic row slices + concat + crossbar + fma  (the real loop)
  noxbar  — 8 dynamic row slices + concat + fma             (no gather)
  purefma — fma only                                        (stream ceiling)

Usage: python experiments/gather_probe4.py [cpu|tpu]
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
K = 512
W = 4096


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


def make_kernel(variant):
    def kernel(x_ref, q_ref, r_ref, v_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            if variant == "purefma":
                g = v_ref[k * 8:(k + 1) * 8, :]
            else:
                rows = [x_ref[pl.ds(q_ref[k * 8 + j], 1), :]
                        for j in range(8)]
                src = jnp.concatenate(rows, axis=0)
                g = src if variant == "noxbar" else jnp.take_along_axis(
                    src, r_ref[k * 8:(k + 1) * 8, :], axis=1)
            acc = acc + v_ref[k * 8:(k + 1) * 8, :] * g
        o_ref[:] = acc
    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(0, W, size=(K * 8,)), jnp.int32)
    r = jnp.asarray(rng.integers(0, 128, size=(K * 8, 128)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((K * 8, 128)) * 0.01, jnp.float32)

    f = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=INTERPRET,
    )

    @jax.jit
    def chain(x, q, r, v):
        def body(i, acc):
            return acc + f(x + acc[0, 0] * 1e-30, q, r, v)
        acc = jax.lax.fori_loop(0, CHAIN, body,
                                jnp.zeros((8, 128), jnp.float32))
        return jnp.sum(acc)

    try:
        t0 = time.perf_counter()
        float(chain(x, q, r, v))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x, q, r, v))
            best = min(best, time.perf_counter() - t0)
        gelems = CHAIN * K * 8 * 128 / best / 1e9
        log({"probe": f"p4_{variant}", "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3), "gelem_per_s": round(gelems, 2)})
    except Exception as e:
        log({"probe": f"p4_{variant}", "error": repr(e)[:400]})


for variant in ("full", "noxbar", "purefma"):
    run(variant)
