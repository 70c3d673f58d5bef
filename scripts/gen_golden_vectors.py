"""Generate the committed golden test vectors (tests/golden_vectors.json).

Regenerate ONLY when an intentional format/algorithm change invalidates
them (then explain in the commit message): the whole point is that
accidental changes to the RNG stream, encodings, NTT tables, serialization
or parameter constants become bit-detectable
(VERDICT round-1 item 4; reference pattern:
ml/extensions/tests/test_radix.py interop round-trips + BASELINE.json
"bit-exact" clause -- tfhe-rs WASM cannot run in this image, so the
vectors are anchored to THIS framework's deterministic streams).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def sha(arr) -> str:
    a = np.asarray(arr)
    return hashlib.sha256(
        a.tobytes() + str(a.shape).encode() + str(a.dtype).encode()
    ).hexdigest()


def main():
    from tfhe_tpu import params as tp
    from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe
    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.ops import folded_ntt
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import decode, encode

    out = {"format": 1}

    # 1) RNG stream: first uniform/binary/tuniform draws from seed 1234
    rng = FheRng(1234)
    out["rng"] = {
        "uniform_torus_8": [int(x) for x in np.asarray(rng.uniform_torus((8,)))],
        "binary_16": [int(x) for x in np.asarray(rng.binary((16,)))],
        "tuniform10_8": [int(x) for x in np.asarray(rng.tuniform(10, (8,)))],
    }

    # 2) NTT: deterministic transform of a fixed polynomial (N=2048)
    eng = folded_ntt.FoldedCrtEngine(2048)
    poly = jnp.asarray((np.arange(2048) * 7 + 3) % 1000 - 500, dtype=jnp.int32)
    f = np.asarray(eng.forward_small(poly))
    out["ntt2048"] = {
        "primes": [int(p) for p in eng.primes],
        "fwd_sha": sha(f),
        "fwd_head": [int(x) for x in f[0, :8]],
    }
    # negacyclic product vs schoolbook on a small exact case
    a = jnp.asarray(np.arange(2048) % 17, dtype=jnp.uint64)
    b = np.zeros(2048, dtype=np.int64)
    b[3] = 2
    prod = np.asarray(eng.polymul_small(jnp.asarray(b, dtype=jnp.int64), a)) if hasattr(eng, "polymul_small") else None
    if prod is not None:
        out["ntt2048"]["monomul_sha"] = sha(prod)

    # 3) TOY shortint: keygen + encrypt + PBS, exact ciphertext hashes
    P = tp.TOY_SHORTINT
    ck, sk = si.keygen(P, seed=7)
    out["toy_keys"] = {
        "lwe_key_sha": sha(ck.lwe_key.key),
        "glwe_key_sha": sha(ck.glwe_key.key),
        "bsk_sha": sha(sk.bsk.bsk_ntt),
        "ksk_sha": sha(sk.ksk.ksk),
    }
    enc_rng = FheRng(99)
    c = si.encrypt(ck, jnp.arange(4, dtype=jnp.uint64), enc_rng)
    out["toy_encrypt"] = {
        "ct_sha": sha(c.ct),
        "decrypt": [int(x) for x in np.asarray(si.decrypt(ck, c))],
    }
    boot = si.apply_function(sk, c, lambda v: (v * 3 + 1) % 4)
    out["toy_pbs"] = {
        "ct_sha": sha(boot.ct),
        "decrypt": [int(x) for x in np.asarray(si.decrypt(ck, boot))],
    }

    # 4) radix ops at noiseless TOY params: exact op outputs
    PN = tp.TOY_SHORTINT_NOISELESS
    ck2, sk2 = si.keygen(PN, seed=8)
    a8 = ri.encrypt_radix(ck2, jnp.asarray([177, 23], dtype=jnp.uint64), 8, FheRng(5))
    b8 = ri.encrypt_radix(ck2, jnp.asarray([99, 201], dtype=jnp.uint64), 8, FheRng(6))
    out["toy_radix"] = {
        "add_sha": sha(ri.add(sk2, a8, b8).blocks),
        "mul_decrypt": [int(x) for x in np.asarray(ri.decrypt_radix(ck2, ri.mul(sk2, a8, b8)))],
    }

    # 5) full fhevm params: key fingerprints only at quick tier
    PF = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    out["fhevm_params"] = {
        "hash": PF.hash,
        "delta": PF.delta,
        "n": PF.lwe_dimension,
        "N": PF.polynomial_size,
    }

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden_vectors.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
