"""Subtractive timing breakdown of the fused blind-rotation step kernel.

Builds the step kernel with pieces skipped (_skip sets) and times each
variant at the flagship shape (full fhevm params, batch 512, steps=4).
The delta between variants attributes wall time to the forward NTT,
external product + rotation, inverse NTT, and Garner recombination.

Measurement rules per PERF_NOTES.md: work sized >= 500 ms, sync via a
host read (block_until_ready does not wait on the axon backend).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tfhe_tpu.utils.xlacache import enable_persistent_cache
enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from tfhe_tpu import params as tp
from tfhe_tpu.models import shortint as si
from tfhe_tpu.ops.pallas_blind_rotate import (
    bsk_to_step_layout,
    make_pallas_blind_rotate,
    monomial_ntt_table,
)
from tfhe_tpu.rng import FheRng

P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
BATCH = 512
STEPS = 4
N_CALLS = 55  # 220 CMux steps per timing rep


def main():
    engine = si.engine_for(P)
    ck, sk = si.keygen(P, seed=1)
    bsk = sk.bsk
    n = engine.n
    tm = int(os.environ.get("TFHE_TPU_TM", "32"))

    bv, bs = bsk_to_step_layout(bsk.bsk_ntt)
    table = monomial_ntt_table(engine)
    rng = np.random.default_rng(0)
    b2 = BATCH * 2
    lo = jnp.asarray(rng.integers(0, 2**32, (b2, n)), dtype=jnp.uint32)
    hi = jnp.asarray(rng.integers(0, 2**32, (b2, n)), dtype=jnp.uint32)
    e = rng.integers(0, 2 * n, (STEPS, BATCH))
    rows = table[jnp.asarray(e)]  # (STEPS, B, 3, 2, N)
    rv = rows[..., 0, :].reshape(STEPS, BATCH * 3, n)
    rs = rows[..., 1, :].reshape(STEPS, BATCH * 3, n)
    bvj, bsj = bv[:STEPS], bs[:STEPS]

    def sync(x):
        jax.device_get(x[0].ravel()[:1] if isinstance(x, tuple) else x.ravel()[:1])

    all_variants = {
        "full": frozenset(),
        "no_garner": frozenset({"garner"}),
        "no_rot": frozenset({"rot"}),
        "no_inv_garner": frozenset({"inv", "garner"}),
        "no_ep_inv_garner": frozenset({"ep", "inv", "garner"}),
        "fwd_skipped": frozenset({"fwd"}),
        "only_decomp": frozenset({"fwd", "ep", "inv", "garner"}),
    }
    names = sys.argv[1:] or list(all_variants)
    variants = [(n, all_variants[n]) for n in names]
    results = {}
    for name, skip in variants:
        step = make_pallas_blind_rotate(
            engine, bsk.gadget.base_log, bsk.shift, tm=tm, steps=STEPS,
            _skip=skip,
        )

        @jax.jit
        def many(lo, hi, rv, rs, bvj, bsj, _step=step):
            def body(c, _):
                l, h = _step(c[0], c[1], rv, rs, bvj, bsj)
                return (l, h), None
            (l, h), _ = jax.lax.scan(body, (lo, hi), None, length=N_CALLS)
            return l, h

        out = many(lo, hi, rv, rs, bvj, bsj)
        sync(out)
        t0 = time.time()
        out = many(lo, hi, rv, rs, bvj, bsj)
        sync(out)
        dt = time.time() - t0
        ms_per_step = 1000.0 * dt / (N_CALLS * STEPS)
        results[name] = ms_per_step
        print(f"{name:20s} {ms_per_step:7.3f} ms/step", flush=True)

    print("RESULTS " + " ".join(f"{k}={v:.3f}" for k, v in results.items()))


if __name__ == "__main__":
    main()
