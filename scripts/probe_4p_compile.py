"""Compile-only probe: which fused-kernel configurations survive the
remote TPU compile helper at 4 primes (flagship N=2048)?

Builds make_pallas_blind_rotate / make_pallas_multibit_step with DUMMY
zero operands and runs .lower().compile() -- no keygen, no correctness,
just the Mosaic/XLA compile. Usage:
    python scripts/probe_4p_compile.py <classic|multibit> <primes 3|4>
        <tm> <steps|g>
Prints PASS/FAIL and wall time.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    kind = sys.argv[1]
    n_primes = int(sys.argv[2])
    tm = int(sys.argv[3])
    extra = int(sys.argv[4])  # steps (classic) or group size (multibit)

    import jax
    import jax.numpy as jnp

    from tfhe_tpu.ops.folded_ntt import (
        FOLDED_PRIMES,
        FOLDED_PRIMES_4,
        get_folded_engine,
    )

    primes = FOLDED_PRIMES if n_primes == 3 else FOLDED_PRIMES_4
    n = 2048
    engine = get_folded_engine(n, primes)
    P = engine.n_primes
    U32 = jnp.uint32
    t0 = time.time()
    if kind == "classic":
        from tfhe_tpu.ops.pallas_blind_rotate import make_pallas_blind_rotate

        steps = extra
        step = make_pallas_blind_rotate(engine, 23, 9, tm=tm, steps=steps)
        b2 = 2 * tm
        args = (
            jnp.zeros((b2, n), U32), jnp.zeros((b2, n), U32),
            jnp.zeros((steps, P * tm, n), U32),
            jnp.zeros((steps, P * tm, n), U32),
            jnp.zeros((steps, 4 * P, n), U32),
            jnp.zeros((steps, 4 * P, n), U32),
        )
    else:
        from tfhe_tpu.ops.pallas_multibit import make_pallas_multibit_step

        g = extra
        step = make_pallas_multibit_step(engine, 23, 9, g, tm=tm)
        b2 = 2 * tm
        args = (
            jnp.zeros((b2, n), U32), jnp.zeros((b2, n), U32),
            jnp.zeros((g, P * tm, n), U32),
            jnp.zeros((g, P * tm, n), U32),
            jnp.zeros(((1 << g) * 4 * P, n), U32),
            jnp.zeros(((1 << g) * 4 * P, n), U32),
        )
    try:
        compiled = step.lower(*args).compile()
        out = compiled(*args)
        jax.device_get(out[0].ravel()[:1])
        print(f"PASS {kind} primes={n_primes} tm={tm} extra={extra} "
              f"{time.time() - t0:.0f}s")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {kind} primes={n_primes} tm={tm} extra={extra} "
              f"{time.time() - t0:.0f}s: {str(e)[:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
