"""Probe Mosaic capabilities on this jax/libtpu: lane-wise dynamic gather
(take_along_axis) inside a Pallas kernel, plus int8 MXU matmul."""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def lane_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def lane_gather(M):
    x = jnp.arange(M * 128, dtype=jnp.int32).reshape(M, 128)
    idx = jnp.broadcast_to((127 - jnp.arange(128, dtype=jnp.int32))[None], (M, 128))
    return pl.pallas_call(
        lane_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def lane_gather_u32(M):
    x = (jnp.arange(M * 128, dtype=jnp.uint32).reshape(M, 128)
         + jnp.uint32(0x80000000))
    idx = jnp.broadcast_to((127 - jnp.arange(128, dtype=jnp.int32))[None], (M, 128))

    def k(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def sublane_gather(M):
    # gather along sublanes (axis 0) — the row-select primitive
    x = jnp.arange(M * 128, dtype=jnp.int32).reshape(M, 128)
    idx = jnp.broadcast_to(((M - 1) - jnp.arange(M, dtype=jnp.int32))[:, None], (M, 128))

    def k(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def int8_mxu():
    a = jnp.ones((256, 128), dtype=jnp.int8)
    b = jnp.ones((128, 256), dtype=jnp.int8)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def big_lane_gather():
    return lane_gather(1024)


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    try_case("lane take_along_axis [8,128] i32", lambda: lane_gather(8))
    try_case("lane take_along_axis [1024,128] i32", big_lane_gather)
    try_case("lane take_along_axis u32", lambda: lane_gather_u32(8))
    try_case("sublane take_along_axis [128,128]", lambda: sublane_gather(128))
    try_case("int8 MXU dot", int8_mxu)
