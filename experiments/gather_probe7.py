"""Probe the transpose-based composite chunk (multi-vreg sublane gather is
broken in this Mosaic build — bisect c/e/f; lane gather + transpose replaces
it: comp = take_along_axis(XT, qT, 1).T).

Cases:
  t_xbar128   — (128,128) lane crossbar (equal shape)
  t_transpose — (128,128) transpose in-kernel
  t_chunk     — full chunk: window slice + XT + lane-gather + T + crossbar
                + fma, K chunks/call, timed
Usage: python experiments/gather_probe7.py [cpu|tpu]
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
CR = 32
K = 16
W = 1024


def log(res):
    res["mode"] = MODE
    with open(OUT, "a") as f:
        f.write(json.dumps(res) + "\n")
    print(res, flush=True)


rng = np.random.default_rng(0)


def smoke(name, kernel, args, out_shape, smem=()):
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM if i in smem else pltpu.VMEM)
             for i in range(len(args))]
    f = pl.pallas_call(kernel,
                       out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                       in_specs=specs, interpret=INTERPRET)
    try:
        out = np.asarray(jax.jit(f)(*args))
        log({"probe": name, "ok": True})
        return out
    except Exception as e:
        log({"probe": name, "error": repr(e)[:200]})
        return None


X = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
R = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.int32)

o = smoke("t_xbar128", lambda xr, rr, out: out.__setitem__(
    ..., jnp.take_along_axis(xr[:], rr[:], axis=1)), (X, R), (128, 128))
if o is not None:
    ok = np.array_equal(o, np.take_along_axis(np.asarray(X), np.asarray(R), 1))
    log({"probe": "t_xbar128_correct", "ok": bool(ok)})

o = smoke("t_transpose", lambda xr, out: out.__setitem__(..., xr[:].T),
          (X,), (128, 128))
if o is not None:
    log({"probe": "t_transpose_correct",
         "ok": bool(np.array_equal(o, np.asarray(X).T))})


def chunk_kernel(x_ref, wb_ref, qt_ref, r_ref, v_ref, o_ref):
    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(K):
        Xw = x_ref[pl.ds(wb_ref[k], 128), :]
        XT = Xw.T
        qt = qt_ref[:, k * CR:(k + 1) * CR].astype(jnp.int32)   # (128, CR)
        qpad = jnp.concatenate(
            [qt, jnp.zeros((128, 128 - CR), jnp.int32)], axis=1)
        G = jnp.take_along_axis(XT, qpad, axis=1)               # (128,128)
        comp = G.T[:CR]                                          # (CR,128)
        g = jnp.take_along_axis(
            comp, r_ref[k * CR:(k + 1) * CR, :].astype(jnp.int32), axis=1)
        p = v_ref[k * CR:(k + 1) * CR, :] * g
        acc = acc + p.reshape(CR // 8, 8, 128).sum(axis=0)
    o_ref[:] = acc


def run_chunk():
    x = jnp.asarray(rng.standard_normal((W, 128)), jnp.float32)
    wb = jnp.asarray(rng.integers(0, (W - 128) // 8, size=(K,)) * 8, jnp.int32)
    qt = jnp.asarray(rng.integers(0, 128, (128, K * CR)), jnp.int8)
    r = jnp.asarray(rng.integers(0, 128, (K * CR, 128)), jnp.int8)
    v = jnp.asarray(rng.standard_normal((K * CR, 128)) * 0.01, jnp.float32)

    f = pl.pallas_call(
        chunk_kernel,
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
    def chain(x, wb, qt, r, v):
        def body(i, acc):
            return acc + f(x + acc[0, 0] * 1e-30, wb, qt, r, v)
        return jnp.sum(jax.lax.fori_loop(
            0, CHAIN, body, jnp.zeros((8, 128), jnp.float32)))

    try:
        t0 = time.perf_counter()
        out = float(chain(x, wb, qt, r, v))
        compile_s = time.perf_counter() - t0
        xn, wbn, qtn, rn, vn = map(np.asarray, (x, wb, qt, r, v))
        acc = np.zeros((8, 128), np.float32)
        for k in range(K):
            Xw = xn[wbn[k]:wbn[k] + 128]
            qk = qtn[:, k * CR:(k + 1) * CR].astype(np.int64).T  # (CR,128)?
            comp = Xw[qk, np.arange(128)[None, :]][:, :]         # wrong dims?
            # comp[s, rho] = Xw[qt[rho, s], rho]
            comp = Xw[qtn[:, k * CR:(k + 1) * CR].astype(np.int64).T,
                      np.arange(128)[None, :]]
            g = np.take_along_axis(comp, rn[k * CR:(k + 1) * CR].astype(np.int64), axis=1)
            acc += (vn[k * CR:(k + 1) * CR] * g).reshape(CR // 8, 8, 128).sum(0)
        expect = CHAIN * acc.sum()
        ok = abs(out - expect) < 1e-2 * max(1.0, abs(expect))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x, wb, qt, r, v))
            best = min(best, time.perf_counter() - t0)
        log({"probe": "t_chunk", "ok": bool(ok),
             "compile_s": round(compile_s, 1),
             "run_ms": round(best * 1e3, 3),
             "gelem_per_s": round(CHAIN * K * CR * 128 / best / 1e9, 2)})
    except Exception as e:
        log({"probe": "t_chunk", "error": repr(e)[:300]})


run_chunk()
