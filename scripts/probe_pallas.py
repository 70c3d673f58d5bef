"""Pallas feasibility probe on the axon TPU backend.

Checks the primitives the fused blind-rotation kernel needs:
  1. basic VMEM kernel
  2. int8 matmul with int32 accumulation on the MXU
  3. bitcast i32 <-> 4x int8 digit planes
  4. scratch persistence across sequential grid steps
  5. VPU throughput inside a Pallas kernel (u32 ops)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def t(run, *args, reps=3):
    out = run(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.devices()[0].platform)

    # 1. basic
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2 + 1

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)
    print("1. basic kernel:", np.asarray(out)[0, :3])

    # 2. int8 matmul in Pallas
    def k2(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.int32
        )

    a = jnp.ones((256, 256), dtype=jnp.int8) * 3
    b = jnp.ones((256, 256), dtype=jnp.int8) * 2
    out = pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32)
    )(a, b)
    print("2. int8 matmul:", np.asarray(out)[0, 0], "(expect", 6 * 256, ")")

    # 3. bitcast i32 -> int8 planes
    def k3(x_ref, o_ref):
        v = x_ref[:]  # (8, 128) i32
        b = pltpu.bitcast(v, jnp.int8)  # shape?
        o_ref[:] = b

    x = jnp.full((8, 128), 0x04030201, dtype=jnp.int32)
    try:
        out = pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int8)
        )(x)
        print("3. bitcast i32->(32,128) i8:", np.asarray(out)[:5, 0])
    except Exception as e:
        print("3a. bitcast (32,128) failed:", str(e)[:200])
        try:
            def k3b(x_ref, o_ref):
                o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

            out = pl.pallas_call(
                k3b, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.int8)
            )(x)
            print("3b. bitcast i32->(8,512) i8:", np.asarray(out)[0, :8])
        except Exception as e2:
            print("3b. failed too:", str(e2)[:200])

    # 3c. shift/mask digit extraction instead
    def k3c(x_ref, o_ref):
        v = x_ref[:]
        d0 = (v << 24) >> 24  # sign-extended low byte
        o_ref[:] = d0.astype(jnp.int8)

    out = pl.pallas_call(
        k3c, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8)
    )(x)
    print("3c. shift-extract byte0:", np.asarray(out)[0, 0], "(expect 1)")

    # 4. scratch persistence across grid
    def k4(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += x_ref[:]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    x = jnp.ones((16, 8, 128), dtype=jnp.int32)
    out = pl.pallas_call(
        k4,
        grid=(16,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.int32)],
    )(x)
    print("4. scratch across grid:", np.asarray(out)[0, 0, 0], "(expect 16)")

    # 5. VPU throughput inside pallas: u32 chain
    N = 512
    it_inner = 256

    def k5(x_ref, o_ref):
        def body(_, u):
            return (u * u) ^ (u >> jnp.uint32(5))

        o_ref[:] = jax.lax.fori_loop(0, it_inner, body, x_ref[:])

    xu = jnp.full((N, 512), 2941, dtype=jnp.uint32)
    run = jax.jit(
        lambda v: pl.pallas_call(
            k5, out_shape=jax.ShapeDtypeStruct((N, 512), jnp.uint32)
        )(v)
    )
    dt = t(run, xu)
    ops = 3 * it_inner * N * 512
    print(f"5. pallas u32 mul+xor+shift chain: {ops/dt/1e12:.3f} Top/s")

    # 6. int8 matmul throughput in Pallas (VMEM resident, chained)
    K = 512

    def k6(a_ref, b_ref, o_ref):
        def body(_, u):
            r = jax.lax.dot(u, b_ref[:], preferred_element_type=jnp.int32)
            return (r & jnp.int32(1)).astype(jnp.int8)

        o_ref[:] = jax.lax.dot(
            jax.lax.fori_loop(0, 32, body, a_ref[:]),
            b_ref[:],
            preferred_element_type=jnp.int32,
        )

    ai = jnp.ones((K, K), dtype=jnp.int8)
    run6 = jax.jit(
        lambda a, b: pl.pallas_call(
            k6, out_shape=jax.ShapeDtypeStruct((K, K), jnp.int32)
        )(a, b)
    )
    dt = t(run6, ai, ai)
    print(f"6. pallas int8 {K}^3 x33: {33*2*K**3/dt/1e12:.2f} Top/s")


if __name__ == "__main__":
    main()
