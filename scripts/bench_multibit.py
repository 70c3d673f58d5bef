"""Multi-bit PBS throughput on the real chip.

Times keyswitch + multi-bit blind rotation + sample extract at
PARAM_MULTI_BIT_GROUP_g_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 (the
tfhe-rs parameter family the reference's GPU coprocessor uses) and
writes BENCH_MULTIBIT.json (group 3) or BENCH_MULTIBIT_G<g>.json
(other groups) next to BENCH artifacts. Decrypt-verified
like bench.py. Usage: python scripts/bench_multibit.py [group] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WASM_REFERENCE_PBS_PER_S = 30.0


def main():
    import jax

    from tfhe_tpu.utils.xlacache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.core.keys import (
        gen_glwe_secret_key,
        gen_lwe_secret_key,
        glwe_to_lwe_secret_key,
    )
    from tfhe_tpu.core.lwe import (
        decrypt_lwe,
        encrypt_lwe,
        gen_keyswitch_key,
        keyswitch,
    )
    from tfhe_tpu.core.multibit import (
        gen_multibit_bootstrap_key,
        multibit_programmable_bootstrap,
    )
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import decode, encode

    group = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import dataclasses

    P = {
        2: tp.PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        3: tp.PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        4: tp.PARAM_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    }[group]

    engine = si.engine_for(P)
    rng = FheRng(1)
    t0 = time.time()
    lwe_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    bsk = gen_multibit_bootstrap_key(
        lwe_sk, glwe_sk, P.pbs, group, rng.fork(), P.glwe_noise, engine
    )
    ksk = gen_keyswitch_key(big_sk, lwe_sk, P.ks, rng.fork(), P.lwe_noise)
    jax.device_get(bsk.bsk_ntt.ravel()[:1])
    keygen_s = time.time() - t0
    print(f"keygen done in {keygen_s:.0f}s", file=sys.stderr, flush=True)

    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = encrypt_lwe(big_sk, encode(vals, P.delta), FheRng(2), P.glwe_noise)
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    ks_jit = jax.jit(keyswitch)

    def step(cts, lut, bsk, ksk):
        # NOT wrapped in an outer jit: multibit_programmable_bootstrap
        # materializes the monomial table eagerly and feeds it to its
        # inner jitted program as an argument (no captured constants)
        return multibit_programmable_bootstrap(
            ks_jit(cts, ksk), lut, bsk, engine
        )

    def sync(x):
        jax.device_get(x.ravel()[:1])

    t1 = time.time()
    out = step(ct, lut, bsk, ksk)
    sync(out)
    compile_s = time.time() - t1
    print(f"compile+first step in {compile_s:.0f}s", file=sys.stderr, flush=True)

    space = P.plaintext_modulus // 2
    dec = np.asarray(decode(decrypt_lwe(big_sk, out), P.delta, space)) % 4
    assert (dec == np.asarray(vals)).all(), "multibit PBS output wrong"

    t2 = time.time()
    for _ in range(iters):
        out = step(ct, lut, bsk, ksk)
    sync(out)
    dt = time.time() - t2

    pbs_per_s = batch * iters / dt
    result = {
        "metric": "multibit_pbs_per_sec_per_chip",
        "value": round(pbs_per_s, 2),
        "unit": "PBS/s",
        "vs_baseline": round(pbs_per_s / WASM_REFERENCE_PBS_PER_S, 2),
        "detail": {
            "params": P.name,
            "group_size": group,
            "batch": batch,
            "iters": iters,
            "ms_per_pbs": round(1000.0 * dt / (batch * iters), 3),
            "keygen_s": round(keygen_s, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = ("BENCH_MULTIBIT.json" if group == 3
           else f"BENCH_MULTIBIT_G{group}.json")
    with open(os.path.join(root, art), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
