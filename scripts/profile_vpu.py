"""Sustained (fused, dispatch-amortized) throughput of candidate NTT
arithmetic strategies on the current backend.

Each benchmark runs a lax.fori_loop of DEPENDENT iterations inside one jit,
so XLA cannot elide work and per-call overhead amortizes away.
"""

import time

import jax
import jax.numpy as jnp


def bench(name, fn, x, iters, ops_per_elt, elts):
    @jax.jit
    def run(x):
        def body(_, v):
            return fn(v)

        return jax.lax.fori_loop(0, iters, body, x)

    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    gops = ops_per_elt * elts * iters / dt / 1e9
    print(f"{name:34s}: {gops:10.1f} Gop/s  ({dt*1e3:7.1f} ms)")


def main():
    print("backend:", jax.devices()[0].platform)
    M = 1 << 22  # 4M elements
    it = 64

    p64 = jnp.uint64(2013265921)
    a64 = (jnp.arange(M, dtype=jnp.uint64) * jnp.uint64(2654435761)) % p64

    bench("u64 mulmod (x*x%p)", lambda v: (v * v) % p64, a64, it, 1, M)
    bench("u64 add", lambda v: v + v + jnp.uint64(1), a64, it, 1, M)
    bench(
        "u64 shift+mask",
        lambda v: ((v >> jnp.uint64(3)) & jnp.uint64(0xFFFF)) + v,
        a64,
        it,
        1,
        M,
    )

    a32 = a64.astype(jnp.uint32)
    bench("u32 mul-lo", lambda v: v * v + jnp.uint32(1), a32, it, 1, M)
    bench("u32 add", lambda v: v + v + jnp.uint32(1), a32, it, 1, M)
    bench(
        "u32 shift+mask",
        lambda v: ((v >> jnp.uint32(3)) & jnp.uint32(0xFFFF)) + v,
        a32,
        it,
        1,
        M,
    )
    s32 = a32.astype(jnp.int32)
    bench("i32 mul-lo", lambda v: v * v + jnp.int32(1), s32, it, 1, M)

    af = (a32 & jnp.uint32(0xFFF)).astype(jnp.float32)
    bench("f32 fma", lambda v: v * jnp.float32(1.00001) + v, af, it, 2, M)
    ab = af.astype(jnp.bfloat16)
    bench("bf16 fma", lambda v: v * jnp.bfloat16(1.01) + v, ab, it, 2, M)

    # u32 mulmod via 16-bit split (mulhi emulation) -- the Montgomery cost
    def u32_mulmod_split(v):
        # full 32x32->64 via 16-bit halves, all in u32
        a_hi = v >> jnp.uint32(16)
        a_lo = v & jnp.uint32(0xFFFF)
        ll = a_lo * a_lo
        lh = a_lo * a_hi
        hh = a_hi * a_hi
        mid = lh + (ll >> jnp.uint32(16))
        hi = hh + (mid >> jnp.uint32(15))  # sloppy; op-count realistic
        return hi ^ ll

    bench("u32 mulhi-ish (6 mul/shift)", u32_mulmod_split, a32, it, 1, M)

    # f32 exact product-pair (Dekker-ish split): cost model for f32-NTT
    def f32_twoprod(v):
        c = v * jnp.float32(4097.0)
        big = c - (c - v)
        lo = v - big
        return big * jnp.float32(1.5) + lo

    bench("f32 split+fma (4 ops)", f32_twoprod, af, it, 4, M)

    # MXU: bf16 matmul sustained
    k = 512
    w = jnp.ones((k, k), dtype=jnp.bfloat16)

    @jax.jit
    def mm(w):
        def body(_, v):
            return jax.lax.dot(
                v, w, precision=None, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 200, body, w)

    out = mm(w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = mm(w)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(
        f"{'bf16 matmul 512^3 x200':34s}: {200*2*k**3/dt/1e12:10.2f} Tflop/s"
    )

    # MXU: int8 matmul sustained
    wi = jnp.ones((k, k), dtype=jnp.int8)

    @jax.jit
    def mmi(w):
        def body(_, v):
            r = jax.lax.dot(v, w, preferred_element_type=jnp.int32)
            return (r & jnp.int32(127)).astype(jnp.int8)

        return jax.lax.fori_loop(0, 200, body, wi)

    out = mmi(wi)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = mmi(wi)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{'int8 matmul 512^3 x200':34s}: {200*2*k**3/dt/1e12:10.2f} Top/s")


if __name__ == "__main__":
    main()
