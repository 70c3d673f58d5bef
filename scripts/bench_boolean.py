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

    from tfhe_tpu.utils.xlacache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.models import boolean as bb
    from tfhe_tpu.rng import FheRng

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    mode = sys.argv[3] if len(sys.argv) > 3 else "shortint"
    if mode == "shortint":
        # Production gate path: a boolean gate = ONE bivariate PBS on the
        # multi-bit shortint engine -- gates/s tracks the PBS rate (the
        # dedicated boolean params below use k=2/level-3 shapes the fused
        # kernel does not cover, so they run the slower XLA scan).
        from tfhe_tpu.models import shortint as si
        from tfhe_tpu.rng import FheRng as _F
        import jax.numpy as _jnp

        P = tp.PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
        ck, sk = si.keygen(P, seed=1)
        jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
        a_bits = np.arange(batch) % 2
        b_bits = (np.arange(batch) // 2) % 2
        ca = si.encrypt(ck, _jnp.asarray(a_bits, dtype=_jnp.uint64), _F(2))
        cb = si.encrypt(ck, _jnp.asarray(b_bits, dtype=_jnp.uint64), _F(3))

        def gate(x, y):
            return si.bivariate_pbs(sk, x, y, lambda u, v: (u & 1) & (v & 1))

        out = gate(ca, cb)
        jax.device_get(out.ct.ravel()[:1])
        dec = np.asarray(si.decrypt(ck, out)) & 1
        assert (dec == (a_bits & b_bits)).all(), "AND gate wrong"
        t0 = time.time()
        for _ in range(iters):
            out = gate(ca, cb)
        jax.device_get(out.ct.ravel()[:1])
        dt = time.time() - t0
        result = {
            "metric": "boolean_gates_per_sec_per_chip",
            "value": round(batch * iters / dt, 2),
            "unit": "gates/s",
            "detail": {
                "params": P.name, "batch": batch, "iters": iters,
                "gate": "AND = one bivariate PBS (multi-bit engine)",
                "backend": jax.devices()[0].platform,
            },
        }
        print(json.dumps(result))
        import os
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH_BOOLEAN.json"), "w") as fh:
            json.dump(result, fh, indent=1)
        return

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
