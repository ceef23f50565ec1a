"""Bisect which kernel construct crashes the Mosaic compile helper."""
import sys
import traceback

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def case(name, kernel, args, out_shape=(8, 128), smem_idx=()):
    specs = []
    for i, a in enumerate(args):
        specs.append(pl.BlockSpec(
            memory_space=pltpu.SMEM if i in smem_idx else pltpu.VMEM))
    f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                       in_specs=specs)
    try:
        np.asarray(jax.jit(f)(*args))
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:140]}", flush=True)


x = jnp.asarray(rng.standard_normal((1024, 128)), jnp.float32)
x8 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
r8 = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int8)
r32 = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
w = jnp.asarray([64], jnp.int32)

# a: int8 -> int32 cast feeding crossbar
case("a_int8cast", lambda xr, rr, o: o.__setitem__(
    ..., jnp.take_along_axis(xr[:], rr[:].astype(jnp.int32), axis=1)),
    (x8, r8))

# b: crossbar where src is a dynamic slice of a bigger VMEM buffer
def kb(xr, wr, rr, o):
    X = xr[pl.ds(wr[0], 8), :]
    o[...] = jnp.take_along_axis(X, rr[:], axis=1)
case("b_dynslice_xbar", kb, (x, w, r32), smem_idx=(1,))

# c: concat-pad + equal-shape subgather on (128,128) + static slice
q32s = jnp.asarray(rng.integers(0, 128, (32, 128)), jnp.int32)
def kc(xr, qr, o):
    X = xr[pl.ds(0, 128), :]
    qpad = jnp.concatenate([qr[:], jnp.zeros((96, 128), jnp.int32)], axis=0)
    comp = jnp.take_along_axis(X, qpad, axis=0)[:8]
    o[...] = comp
case("c_pad_subgather", kc, (x, q32s))

# d: 3D reshape-sum
v32 = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
def kd(vr, o):
    o[...] = vr[:].reshape(4, 8, 128).sum(axis=0)
case("d_reshape_sum", kd, (v32,))

# e: subgather (128,128) equal shape, src direct ref
X128 = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
q128 = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.int32)
def ke(xr, qr, o):
    comp = jnp.take_along_axis(xr[:], qr[:], axis=0)
    o[...] = comp[:8]
case("e_subgather128", ke, (X128, q128))

# f: dynamic-sliced src into subgather (the window pattern)
def kf(xr, wr, qr, o):
    X = xr[pl.ds(wr[0], 128), :]
    comp = jnp.take_along_axis(X, qr[:], axis=0)
    o[...] = comp[:8]
case("f_dynslice_subgather", kf, (x, w, q128), smem_idx=(1,))
