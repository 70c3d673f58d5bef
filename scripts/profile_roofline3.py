"""Roofline v3: correct timing under the async axon backend.

block_until_ready does NOT wait on axon; every measurement must end with a
host read of (a slice of) the result. Chains are non-affine so XLA cannot
collapse them.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


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

    # --- MXU ---
    k = 8192
    a = jnp.full((k, k), 0.001, dtype=jnp.bfloat16)
    b = jnp.full((k, k), 0.002, dtype=jnp.bfloat16)
    mm = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))
    dt = t(mm, a, b)
    print(f"bf16 {k}^3 matmul: {2*k**3/dt/1e12:8.2f} Tflop/s ({dt*1e3:.1f} ms)")

    ai = jnp.ones((k, k), dtype=jnp.int8)
    mmi = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))
    dt = t(mmi, ai, ai)
    print(f"int8 {k}^3 matmul: {2*k**3/dt/1e12:8.2f} Top/s ({dt*1e3:.1f} ms)")

    af32 = a.astype(jnp.float32)
    dt = t(mm, af32.astype(jnp.bfloat16), b)  # sanity same as bf16
    mmf = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))
    dt = t(mmf, af32, af32)
    print(f"f32  {k}^3 matmul: {2*k**3/dt/1e12:8.2f} Tflop/s ({dt*1e3:.1f} ms)")

    # --- HBM bandwidth: out-of-place add of 1 GiB ---
    n = 1 << 28  # 1 GiB f32
    x = jnp.arange(n, dtype=jnp.float32)
    add1 = jax.jit(lambda v: v * 1.5 + 2.0)
    dt = t(add1, x)
    print(f"axpy 1GiB: {2*4*n/dt/1e9:8.1f} GB/s ({dt*1e3:.1f} ms)")

    # --- VPU chains (per-element, in one fused loop; non-affine) ---
    n = 1 << 22
    it = 64

    def chain(name, x, body_one, ops_per, inner=16):
        @jax.jit
        def run(v):
            def body(_, u):
                for _ in range(inner):
                    u = body_one(u)
                return u

            return jax.lax.fori_loop(0, it, body, v)

        dt = t(run, x)
        tot = ops_per * inner * it * n
        print(f"{name:32s}: {tot/dt/1e12:8.3f} Top/s")

    xf = jnp.full((n,), 1.1, dtype=jnp.float32)
    chain("f32 abs*c+c (3op)", xf, lambda u: jnp.abs(u * jnp.float32(-1.0000001)) + jnp.float32(1e-9), 3)
    xi = jnp.full((n,), 2941, dtype=jnp.int32)
    chain("i32 (u*u)^(u>>5) (3op)", xi, lambda u: (u * u) ^ (u >> jnp.int32(5)), 3)
    xu = jnp.full((n,), 2941, dtype=jnp.uint32)
    p32 = jnp.uint32(2013265921)
    chain("u32 (u*u+1)%p (2op)", xu, lambda u: (u * u + jnp.uint32(1)) % p32, 2)
    xu64 = jnp.full((n,), 2941, dtype=jnp.uint64)
    p64 = jnp.uint64(2013265921)
    chain("u64 (u*u+1)%p (2op)", xu64, lambda u: (u * u + jnp.uint64(1)) % p64, 2)
    chain("u64 shift+mask+add (3op)", xu64, lambda u: ((u >> jnp.uint64(8)) & jnp.uint64(0xFFFF)) + u, 3)
    chain("u32 shift+mask+add (3op)", xu, lambda u: ((u >> jnp.uint32(8)) & jnp.uint32(0xFFFF)) + u, 3)
    # u64 full mulmod of two u64 < p via u64 native (emulated)
    chain(
        "u64 addmod (3op)",
        xu64,
        lambda u: (lambda s: s - jnp.where(s >= p64, p64, jnp.uint64(0)))(u + u),
        3,
    )
    # conversions
    chain("u32->f32->u32 (2op)", xu, lambda u: (u.astype(jnp.float32) + 1.0).astype(jnp.uint32), 3)


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
