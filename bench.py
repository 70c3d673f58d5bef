"""Benchmark: programmable bootstraps/sec per chip (BASELINE.json north star).

Runs batched PBS (keyswitch + blind rotate + sample extract) at the full
fhevm parameter set PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
(N=2048, k=1, n=880, 5-level keyswitch) on the default JAX backend (the
real TPU chip under the driver; CPU elsewhere) and prints ONE JSON line.

Baseline denominator: the reference's crypto engine is tfhe-rs consumed as
WASM (sdk/relayer pins tfhe@1.4.0-alpha.3); it cannot execute in this image
(no node runtime, no vendored .wasm). Published tfhe-rs figures for these
params are ~6-8 ms/PBS native single-thread and 3-5x slower under WASM;
we use 30 PBS/s as the single-thread WASM denominator (documented estimate,
see BASELINE.md "Action item").
"""

import json
import sys
import time

WASM_REFERENCE_PBS_PER_S = 30.0


def main():
    import jax

    # persistent compile cache: keygen/PBS programs are identical across
    # runs; caching cuts the multi-minute remote-tunnel compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/tfhe_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.core.bootstrap import programmable_bootstrap
    from tfhe_tpu.core.lwe import keyswitch
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng

    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    t0 = time.time()
    ck, sk = si.keygen(P, seed=1)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])  # force keygen completion
    keygen_s = time.time() - t0

    engine = si.engine_for(P)
    rng = FheRng(2)
    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = si.encrypt(ck, vals, rng).ct
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    @jax.jit
    def step(cts, lut, bsk, ksk):
        # keys enter as arguments (device-resident), never as baked-in
        # constants -- constants would ride every compile payload
        return programmable_bootstrap(keyswitch(cts, ksk), lut, bsk, engine)

    def sync(x):
        # block_until_ready does NOT synchronize on the axon backend
        # (PERF_NOTES.md); a host read of one element forces completion.
        jax.device_get(x.ravel()[:1])

    t1 = time.time()
    out = step(ct, lut, sk.bsk, sk.ksk)
    sync(out)
    compile_s = time.time() - t1

    # correctness gate: the benchmark must compute real bootstraps
    dec = si.decrypt(ck, si.Ciphertext(ct=out, params=P, degree=3, noise_level=1))
    assert (np.asarray(dec) == np.asarray(vals)).all(), "PBS output wrong"

    t2 = time.time()
    for _ in range(iters):
        out = step(ct, lut, sk.bsk, sk.ksk)
    sync(out)
    dt = time.time() - t2

    pbs_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "pbs_per_sec_per_chip",
                "value": round(pbs_per_s, 2),
                "unit": "PBS/s",
                "vs_baseline": round(pbs_per_s / WASM_REFERENCE_PBS_PER_S, 2),
                "detail": {
                    "params": P.name,
                    "batch": batch,
                    "iters": iters,
                    "ms_per_pbs": round(1000.0 * dt / (batch * iters), 3),
                    "keygen_s": round(keygen_s, 1),
                    "compile_s": round(compile_s, 1),
                    "backend": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
