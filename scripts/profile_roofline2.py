"""Roofline v2: dependency chains that XLA cannot algebraically collapse."""

import time

import jax
import jax.numpy as jnp


def t(run, *args, reps=3):
    out = run(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.devices()[0].platform)

    # chained matmuls (data-dependent, no conversions)
    k = 4096
    a = jnp.full((k, k), 0.001, dtype=jnp.bfloat16)
    b = jnp.eye(k, dtype=jnp.bfloat16)
    it = 16

    @jax.jit
    def mm(a, b):
        def body(_, v):
            return jax.lax.dot(v, b, preferred_element_type=jnp.bfloat16)

        return jax.lax.fori_loop(0, it, body, a)

    dt = t(mm, a, b)
    print(f"bf16 {k}^3 x{it} chained: {2*it*k**3/dt/1e12:8.2f} Tflop/s ({dt*1e3:.1f} ms)")

    ai = jnp.ones((k, k), dtype=jnp.int8)

    @jax.jit
    def mmi(a):
        def body(_, v):
            r = jax.lax.dot(v, v, preferred_element_type=jnp.int32)
            return (r & jnp.int32(1)).astype(jnp.int8)

        return jax.lax.fori_loop(0, 4, body, a)

    dt = t(mmi, ai)
    print(f"int8 {k}^3 x4 chained (incl i32 mask+cast): {2*4*k**3/dt/1e12:8.2f} Top/s ({dt*1e3:.1f} ms)")

    # HBM: chained big adds (read 2 arrays, write 1) -- dependency via rotation
    n = (1 << 27)  # 512 MiB f32
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def bw(v):
        def body(_, u):
            return jnp.roll(u, 1) + 1.0

        return jax.lax.fori_loop(0, 8, body, v)

    dt = t(bw, x)
    print(f"roll+add 512MiB x8: {8*2*4*n/dt/1e9:8.1f} GB/s ({dt*1e3:.1f} ms)")

    # VPU f32: non-affine chain (uses abs to break affinity)
    n = 1 << 20
    xf = jnp.full((n,), 1.1, dtype=jnp.float32)

    @jax.jit
    def vf(v):
        def body(_, u):
            for _ in range(16):
                u = jnp.abs(u * jnp.float32(-1.0000001)) + jnp.float32(1e-9)
            return u

        return jax.lax.fori_loop(0, 64, body, v)

    dt = t(vf, xf)
    print(f"f32 abs-fma chain: {3*16*64*n/dt/1e12:8.3f} Top/s")

    # VPU i32 multiply: non-affine via xor between muls
    xi = jnp.full((n,), 3, dtype=jnp.int32)

    @jax.jit
    def vi(v):
        def body(_, u):
            for _ in range(16):
                u = (u * u) ^ (u >> jnp.int32(5))
            return u

        return jax.lax.fori_loop(0, 64, body, v)

    dt = t(vi, xi)
    print(f"i32 mul+xor+shift chain (3 ops): {3*16*64*n/dt/1e12:8.3f} Top/s")

    # u32 16-bit-split mulhi sequence (real Montgomery building block)
    xu = jnp.full((n,), 12345, dtype=jnp.uint32)

    @jax.jit
    def vm(v):
        def body(_, u):
            for _ in range(4):
                lo = u & jnp.uint32(0xFFFF)
                hi = u >> jnp.uint32(16)
                ll = lo * lo
                lh = lo * hi
                hh = hi * hi
                u = hh + (lh >> jnp.uint32(15)) ^ (ll >> jnp.uint32(16))
            return u

        return jax.lax.fori_loop(0, 64, body, v)

    dt = t(vm, xu)
    print(f"u32 mulhi-seq (9 ops x4 x64): {9*4*64*n/dt/1e12:8.3f} Top/s")

    # u64 mulmod with x64 enabled? (check dtype)
    print("x64 enabled:", jnp.zeros((), jnp.float64).dtype == jnp.float64)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
