"""GLWE encrypted-clear matmul throughput on the default backend.

The reference's concrete-ml-extensions headline path: an encrypted
activation matrix times a clear quantized weight matrix, one-to-many in
the NTT domain, packed + mod-switched on the way out (reference:
ml/extensions/rust/src/ml.rs:66-91 cuda one-to-many dot,
compression.rs:190-291 packing keyswitch, fhext_classes.rs:100-114
PARAMS_8B_2048). This measures the TPU equivalent end-to-end
(encrypt -> matmul -> decrypt-verify) at the reference's default
parameter set and writes BENCH_MATMUL.json.

Run: python scripts/bench_matmul.py [R] [O] [iters]
Defaults R=32, O=1024, inner C=N=2048 (the reference's inner dim).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import jax

    from tfhe_tpu.utils.xlacache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu.models import glwe_matmul as gm
    from tfhe_tpu.rng import FheRng

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    P = gm.default_params()
    C = P.polynomial_size  # reference inner dim 2048 = one GLWE chunk

    t0 = time.time()
    pkey = gm.create_private_key(P, seed=3)
    jax.device_get(pkey.pksk.ksk_ntt.ravel()[:1])
    keygen_s = time.time() - t0

    rng = np.random.default_rng(11)
    # 8-bit inputs x signed 3-bit weights: max |dot| = 2048*255*7 ~ 2^22,
    # inside the 2^26 storage modulus so the gate is EXACT equality (the
    # reference's dynamic per-channel quantization keeps products in the
    # same budget; its correctness tests sweep n_bits the same way)
    a = rng.integers(0, 1 << 8, (R, C), dtype=np.uint64)
    w = rng.integers(-7, 8, (C, O), dtype=np.int64)

    t0 = time.time()
    enc = gm.encrypt_matrix(pkey, jnp.asarray(a), FheRng(7))
    jax.device_get(enc.glwes.ravel()[:1])
    encrypt_s = time.time() - t0

    # weights transformed once, device-resident, entering jit as an
    # ARGUMENT (PreparedClearMatrix) -- the reference's device-resident
    # matrix pattern (lib_python.rs:243-339)
    prep = gm.prepare_clear_weights(P, w)
    jax.device_get(prep.f_w.ravel()[:1])

    step = jax.jit(
        lambda e, pw, pk: gm.matrix_multiplication(
            gm.EncryptedMatrix(glwes=e, params=P, n_valid=C, shape=(R, C)),
            pw,
            pk,
        )
    )

    t0 = time.time()
    out = step(enc.glwes, prep, pkey)
    jax.device_get(out.data.ravel()[:1])
    compile_s = time.time() - t0

    # correctness gate: decrypt and check error against the noise budget.
    # PARAMS_8B_2048 results are approximate BY DESIGN (the packing
    # keyswitch + 2^26 storage modulus leave integer-level noise; the
    # reference ships measured noise profiles for exactly this path,
    # noise_profiles/MANIFEST.json, rather than exact outputs).
    got = np.asarray(gm.decrypt_matrix(out, pkey))
    want = (a.astype(np.int64) @ w).astype(np.int64)
    err = (got - want).astype(np.float64)
    err_std = float(err.std())
    err_max = int(np.abs(err).max())
    assert err_max <= 256, f"matmul noise beyond budget: max|err|={err_max}"
    # signal ~2^22, noise sigma ~2^4 => ~18 bits of accuracy, matching
    # the reference's 27-bit-budget / noise-profile regime

    t0 = time.time()
    for _ in range(iters):
        out = step(enc.glwes, prep, pkey)
    jax.device_get(out.data.ravel()[:1])
    dt = time.time() - t0

    per_matmul = dt / iters
    macs = R * C * O
    result = {
        "metric": "encrypted_matmul_gmacs_per_sec",
        "value": round(macs * iters / dt / 1e9, 3),
        "unit": "Gmac/s (encrypted x clear)",
        "detail": {
            "params": "PARAMS_8B_2048 (reference fhext default: N=2048, "
            "q=2^64, 27 compute bits, PKS l=2/bl=14, q_out 2^26)",
            "shape": f"enc({R}x{C}) x clear({C}x{O})",
            "s_per_matmul": round(per_matmul, 4),
            "matmuls_per_s": round(1.0 / per_matmul, 3),
            "rows_per_s": round(R / per_matmul, 1),
            "keygen_s": round(keygen_s, 1),
            "encrypt_s": round(encrypt_s, 2),
            "compile_s": round(compile_s, 1),
            "iters": iters,
            "noise_gate": {
                "err_std": round(err_std, 2),
                "err_max": err_max,
                "signal_max": int(np.abs(want).max()),
                "accuracy_bits": round(
                    float(np.log2(max(1, int(np.abs(want).max())) / max(1.0, 2 * err_std))), 1
                ),
            },
            "output": "packed GLWEs mod-switched to 2^26 storage "
            "(compression.rs wire format)",
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_MATMUL.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
