"""Raw roofline numbers for this chip: HBM bandwidth, VPU compute at high
arithmetic intensity, MXU at high intensity (weights resident, K large)."""

import time

import jax
import jax.numpy as jnp


def t(run, *args):
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    print("backend:", jax.devices()[0].platform)

    # HBM bandwidth: big f32 copy (read+write)
    for mb in (64, 512):
        n = mb * 1 << 18
        x = jnp.arange(n, dtype=jnp.float32)
        run = jax.jit(lambda v: v + 1.0)
        dt = t(run, x)
        print(f"copy+1 {mb:4d} MiB: {2*4*n/dt/1e9:8.1f} GB/s ({dt*1e3:.2f} ms)")

    # VPU at high intensity: 64 chained FMAs per element per loop iter,
    # small enough to stay in VMEM? (XLA fuses the 64 FMAs into one kernel)
    n = 1 << 20
    x = jnp.full((n,), 1.0000001, dtype=jnp.float32)

    @jax.jit
    def vpu(v):
        def body(_, u):
            for _ in range(64):
                u = u * jnp.float32(1.0000001) + jnp.float32(1e-9)
            return u

        return jax.lax.fori_loop(0, 32, body, v)

    dt = t(vpu, x)
    print(f"f32 FMA chain (64/elt/iter): {2*64*32*n/dt/1e12:8.3f} Tflop/s")

    xi = jnp.full((n,), 3, dtype=jnp.int32)

    @jax.jit
    def vpui(v):
        def body(_, u):
            for _ in range(64):
                u = u * jnp.int32(5) + jnp.int32(1)
            return u

        return jax.lax.fori_loop(0, 32, body, v)

    dt = t(vpui, xi)
    print(f"i32 mul chain (64/elt/iter): {64*32*n/dt/1e12:8.3f} Tmul/s")

    @jax.jit
    def vpus(v):
        def body(_, u):
            for _ in range(64):
                u = (u >> jnp.int32(1)) + (u & jnp.int32(0xFFFF))
            return u

        return jax.lax.fori_loop(0, 32, body, xi)

    dt = t(vpus, xi)
    print(f"i32 shift+mask+add chain   : {3*64*32*n/dt/1e12:8.3f} Top/s")

    # MXU: big matmul, no conversion in the chain
    for k in (1024, 4096):
        a = jnp.ones((k, k), dtype=jnp.bfloat16)
        b = jnp.ones((k, k), dtype=jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

        dt = t(mm, a, b)
        print(f"bf16 {k}^3 single matmul: {2*k**3/dt/1e12:8.2f} Tflop/s")

    k = 2048
    ai = jnp.ones((k, k), dtype=jnp.int8)
    bi = jnp.ones((k, k), dtype=jnp.int8)

    @jax.jit
    def mmi(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    dt = t(mmi, ai, bi)
    print(f"int8 {k}^3 single matmul: {2*k**3/dt/1e12:8.2f} Top/s")

    # batched small matmul typical of four-step: (B, 64, 32) x (64, 64)
    B = 256 * 2 * 3 * 4
    xb = jnp.ones((B, 64, 32), dtype=jnp.bfloat16)
    wb = jnp.ones((256, 64), dtype=jnp.bfloat16)

    @jax.jit
    def mmb(w, v):
        return jax.lax.dot_general(
            w, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    dt = t(mmb, wb, xb)
    print(
        f"four-step-ish (256x64)@(B,64,32) B={B}: "
        f"{2*256*64*32*B/dt/1e12:8.2f} Tflop/s ({dt*1e3:.2f} ms)"
    )


if __name__ == "__main__":
    main()
