"""Minimal repro: does jnp.take_along_axis lower inside a Pallas TPU kernel
on this toolchain, and what does the AssertionError actually say?"""
import traceback

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl


def try_case(name, kernel, args, out_shape):
    f = pl.pallas_call(kernel, out_shape=out_shape)
    try:
        out = np.asarray(jax.jit(f)(*args))
        print(f"{name}: OK out[0,:4]={out[0, :4]}", flush=True)
        return out
    except Exception:
        print(f"{name}: FAIL", flush=True)
        traceback.print_exc()
        return None


rng = np.random.default_rng(0)
xw = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
r = jnp.asarray(rng.integers(0, 128, size=(8, 128)), jnp.int32)

# 1. plain lane gather via take_along_axis
def k1(xw_ref, r_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(xw_ref[:], r_ref[:], axis=1)

o = try_case("take_along_axis_lane", k1, (xw, r),
             jax.ShapeDtypeStruct((8, 128), jnp.float32))
if o is not None:
    ref = np.take_along_axis(np.asarray(xw), np.asarray(r), axis=1)
    print("  correct:", np.array_equal(o, ref), flush=True)

# 2. sublane gather
q = jnp.asarray(rng.integers(0, 8, size=(8, 128)), jnp.int32)
def k2(xw_ref, q_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(xw_ref[:], q_ref[:], axis=0)

o = try_case("take_along_axis_sublane", k2, (xw, q),
             jax.ShapeDtypeStruct((8, 128), jnp.float32))
if o is not None:
    ref = np.take_along_axis(np.asarray(xw), np.asarray(q), axis=0)
    print("  correct:", np.array_equal(o, ref), flush=True)
