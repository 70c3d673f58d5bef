"""Microbenchmark the PBS components on the current backend.

Answers: where do the 115 ms/PBS go?  Times (a) raw u64/u32 modular
arithmetic throughput, (b) four-step NTT forward/backward, (c) one
external product, (d) monomial rotation, (e) a short blind-rotation scan,
so per-step cost extrapolates to the full n=880 rotation.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from tfhe_tpu import params as tp
    from tfhe_tpu.core.ggsw import external_product
    from tfhe_tpu.core.bootstrap import blind_rotate
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.ops.polynomial import get_engine
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import negacyclic_monomial_rotate

    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    batch = 256
    N = P.pbs_params.polynomial_size if hasattr(P, "pbs_params") else 2048
    print("backend:", jax.devices()[0].platform, " batch:", batch, " N:", N)

    # (a) raw elementwise ops
    M = batch * 2 * 3 * 2048  # one acc's worth of residues
    a64 = jnp.arange(M, dtype=jnp.uint64) % jnp.uint64(2**31 - 1)
    b64 = a64[::-1]
    p64 = jnp.uint64(2013265921)
    t = timeit(lambda x, y: (x * y) % p64, a64, b64)
    print(f"u64 mulmod      : {M/t/1e9:8.2f} Gop/s   ({t*1e3:.3f} ms / {M} elts)")
    a32 = a64.astype(jnp.uint32)
    b32 = b64.astype(jnp.uint32)
    t = timeit(lambda x, y: x * y, a32, b32)
    print(f"u32 mul (lo)    : {M/t/1e9:8.2f} Gop/s")
    t = timeit(lambda x, y: (x.astype(jnp.uint64) * y) % p64, a32, b64)
    print(f"u32->u64 mulmod : {M/t/1e9:8.2f} Gop/s")
    af = a32.astype(jnp.float32)
    bf = b32.astype(jnp.float32)
    t = timeit(lambda x, y: x * y, af, bf)
    print(f"f32 mul         : {M/t/1e9:8.2f} Gop/s")
    t = timeit(lambda x, y: x + y, a64, b64)
    print(f"u64 add         : {M/t/1e9:8.2f} Gop/s")
    # u64 shift+mask (limb extract)
    t = timeit(lambda x: ((x >> jnp.uint64(8)) & jnp.uint64(0xFF)), a64)
    print(f"u64 shift+mask  : {M/t/1e9:8.2f} Gop/s")

    # (b) NTT transforms
    eng = get_engine(2048)
    x_small = (jnp.arange(batch * 2 * 2048, dtype=jnp.int64) % 1024).reshape(
        batch, 2, 2048
    )
    t = timeit(eng.forward_small, x_small)
    print(f"forward_small(batch,2,N): {t*1e3:8.2f} ms")
    x_u64 = a64.reshape(batch, 6, 2048)[:, :2, :]
    t = timeit(eng.forward_u64, x_u64)
    print(f"forward_u64 (batch,2,N) : {t*1e3:8.2f} ms")
    f_dom = jnp.zeros((batch, 2, 3, 2048), dtype=jnp.uint32)
    t = timeit(lambda f: eng.backward(f), f_dom)
    print(f"backward (batch,2,3,N)  : {t*1e3:8.2f} ms")
    t = timeit(lambda x, y: eng.pointwise_mul(x, y), f_dom, f_dom)
    print(f"pointwise (batch,2,3,N) : {t*1e3:8.2f} ms")

    # (c) one external product step at full params
    ck, sk = si.keygen(P, seed=1)
    bsk = sk.bsk
    engine = si.engine_for(P)
    acc = jnp.zeros((batch, 2, 2048), dtype=jnp.uint64)
    bsk_j = bsk.bsk_ntt[0]
    t = timeit(
        lambda b, a: external_product(b, a, bsk.gadget, engine, shift=bsk.shift),
        bsk_j,
        acc,
        iters=5,
    )
    print(f"external_product 1 step : {t*1e3:8.2f} ms  -> x880 = {t*880:.2f} s")

    # (d) monomial rotate
    r = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4096)
    t = timeit(lambda a, e: negacyclic_monomial_rotate(a, e[..., None]), acc, r)
    print(f"monomial_rotate         : {t*1e3:8.2f} ms")

    # (e) short scan (16 steps) to catch scan overhead
    rng = FheRng(2)
    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = si.encrypt(ck, vals, rng).ct
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))
    import dataclasses

    bsk16 = dataclasses.replace(bsk, bsk_ntt=bsk.bsk_ntt[:16])
    ct16 = ct[..., jnp.r_[0:16, -1]]
    t = timeit(lambda l, c: blind_rotate(l, c, bsk16, engine), lut, ct16, iters=3)
    print(f"blind_rotate 16 steps   : {t*1e3:8.2f} ms  ({t/16*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
