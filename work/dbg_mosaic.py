"""Bisect which construct crashes the Mosaic compiler in pallas_conv."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).shape}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


# P1: 3D x 2D dot_general (rows untiled, cols sublane, ch lane)
def p1():
    def k(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    x = jnp.ones((24, 48, 64), jnp.bfloat16)
    w = jnp.ones((64, 128), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((24, 48, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)


# P2: in-kernel moveaxis (th, tw, c) -> (c, th, tw)
def p2():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.moveaxis(x_ref[:], -1, 0)

    x = jnp.ones((16, 128, 4), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((4, 16, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# P3: DMA into a lane-sliced scratch destination
def p3():
    def k(x_hbm, o_ref, slab, sem):
        d = pltpu.make_async_copy(x_hbm.at[0, :, :, 0:2], slab.at[:, :, 0:2], sem)
        d.start()
        d.wait()
        o_ref[:] = slab[:, :, 0:2]

    x = jnp.ones((1, 16, 128, 2), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128, 2), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128, 64), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)


# P4: static shifted slices (sublane+lane offsets) + sum, like tap_sum
def p4():
    def k(x_ref, o_ref):
        acc = jnp.zeros((30, 126, 16), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + x_ref[dy:dy + 30, dx:dx + 126, :].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    x = jnp.ones((32, 128, 16), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((30, 126, 16), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)




# P5: DMA window from a 64-lane source into a 64-lane slab
def p5():
    def k(x_hbm, o_ref, slab, sem):
        d = pltpu.make_async_copy(x_hbm.at[0, pl.ds(8, 16), pl.ds(8, 128), :],
                                  slab, sem)
        d.start()
        d.wait()
        o_ref[:] = slab[:]

    x = jnp.ones((1, 64, 256, 64), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128, 64), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128, 64), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)


probe("P5 64-lane DMA window", p5)
