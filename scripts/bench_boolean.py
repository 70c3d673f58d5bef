"""Secondary benchmark: boolean gate bootstraps/sec (BASELINE config 1).

N=1024 boolean parameters; one AND gate = one PBS + keyswitch. The
primary metric stays bench.py's full-fhevm-params PBS/s; this measures
the lighter gate-bootstrap configuration.

Run: python scripts/bench_boolean.py [batch] [iters]
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tfhe_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.models import boolean as bb
    from tfhe_tpu.rng import FheRng

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    P = tp.BOOLEAN_PARAMS_128
    ck, sk = bb.keygen(P, seed=1)
    rng = FheRng(2)
    a = bb.encrypt(ck, jnp.asarray(np.arange(batch) % 2, dtype=bool), rng)
    b = bb.encrypt(ck, jnp.asarray((np.arange(batch) // 2) % 2, dtype=bool), rng)

    # keys enter as arguments (device-resident), never baked-in constants
    # (constants ride the remote compile payload: HTTP 413 over the tunnel)
    gate = jax.jit(lambda x, y, k: bb.and_(k, x, y))

    out = gate(a, b, sk)
    jax.device_get(out.ravel()[:1])
    # correctness
    dec = np.asarray(bb.decrypt(ck, out))
    exp = (np.arange(batch) % 2).astype(bool) & ((np.arange(batch) // 2) % 2).astype(bool)
    assert (dec == exp).all(), "AND gate wrong"

    t0 = time.time()
    for _ in range(iters):
        out = gate(a, b, sk)
    jax.device_get(out.ravel()[:1])
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "boolean_gates_per_sec_per_chip",
                "value": round(batch * iters / dt, 2),
                "unit": "gates/s",
                "detail": {"params": P.name, "batch": batch, "iters": iters},
            }
        )
    )


if __name__ == "__main__":
    main()
