"""Break down one blind-rotation step at full fhevm params on the TPU.

Times each stage as a separate fused-loop jit with honest host sync:
rotate+decompose | fwd NTT | pointwise+contract | inv NTT | Garner+acc.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu import params as tp
from tfhe_tpu.core.ggsw import contract_residues, decompose_forward
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import negacyclic_monomial_rotate

U64 = jnp.uint64


def timeit(fn, *args, iters=8):
    o = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    B = 256
    engine = si.engine_for(P)
    ck, sk = si.keygen(P, seed=1)
    bsk = sk.bsk
    bsk_j = bsk.bsk_ntt[0]

    rng = np.random.default_rng(0)
    acc = jnp.asarray(
        rng.integers(0, 2**64, size=(B, 2, 2048), dtype=np.uint64)
    )
    e = jnp.asarray(rng.integers(0, 4096, size=(B,), dtype=np.uint64))

    t = timeit(jax.jit(lambda a, e: negacyclic_monomial_rotate(a, e[..., None]) - a), acc, e)
    print(f"rotate+diff      : {t*1e3:7.2f} ms")

    diff = negacyclic_monomial_rotate(acc, e[..., None]) - acc
    t = timeit(jax.jit(lambda d: decompose_forward(d, bsk.gadget, engine)), diff)
    print(f"decompose+fwdNTT : {t*1e3:7.2f} ms")

    fd = decompose_forward(diff, bsk.gadget, engine)
    t = timeit(jax.jit(lambda f, k: contract_residues(k, f, engine)), fd, bsk_j)
    print(f"pointwise+contract: {t*1e3:7.2f} ms")

    res = contract_residues(bsk_j, fd, engine)
    t = timeit(
        jax.jit(lambda r: engine.backward(engine.condsub_domain(r), shift=bsk.shift)),
        res,
    )
    print(f"invNTT+Garner    : {t*1e3:7.2f} ms")

    # whole step for reference
    from tfhe_tpu.core.ggsw import external_product

    def step(a, e, k):
        rot = negacyclic_monomial_rotate(a, e[..., None])
        return a + external_product(k, rot - a, bsk.gadget, engine, shift=bsk.shift)

    t = timeit(jax.jit(step), acc, e, bsk_j)
    print(f"WHOLE step       : {t*1e3:7.2f} ms  (x880 = {t*880*1e3/B:.2f} ms/PBS)")


if __name__ == "__main__":
    main()
