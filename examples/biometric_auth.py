"""Encrypted biometric matching: iris-code Hamming distance under FHE.

Reproduces the reference's biometrics demo (reference: ml/biometrics/
notebooks/main.rs -- iris-code Hamming-distance authentication with
TFHE shortint): the enrolled template is encrypted; the probe is public
to the matcher; the Hamming distance accumulates homomorphically and
only a thresholded verdict is ever decrypted.

dist(a, b) = sum_i a_i XOR b_i; with a public probe this is a linear
form in the encrypted template bits, so the whole match is additive
LWE algebra + one threshold comparison via PBS.

Run:  python examples/biometric_auth.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import params as tp
from tfhe_tpu.models import integer as ri
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng


def main():
    params = tp.TOY_SHORTINT
    ck, sk = si.keygen(params, seed=11)
    rng = FheRng(12)

    bits = 64  # iris-code length (reference uses larger codes; same math)
    rs = np.random.default_rng(0)
    template = rs.integers(0, 2, size=bits)

    # enroll: encrypt each template bit as a radix euint8 digit so the
    # homomorphic popcount accumulates without overflow (sum <= 64)
    enc_bits = ri.encrypt_radix(
        ck, jnp.asarray(template, dtype=jnp.uint64), 8, rng
    )

    def match(probe: np.ndarray, threshold: int) -> bool:
        # XOR with a PUBLIC probe bit flips encrypted bits where probe=1:
        # x ^ p = p + x - 2*p*x -> for p in {0,1}: p=0 -> x ; p=1 -> 1-x
        acc = None
        for i in range(bits):
            bit_i = ri.RadixCiphertext(
                blocks=enc_bits.blocks[i][None],
                params=enc_bits.params,
                degrees=enc_bits.degrees,
            )
            if probe[i] == 1:  # 1 - x
                one = ri.trivial_radix(params, jnp.asarray([1], dtype=jnp.uint64), 8)
                term = ri.sub(sk, one, bit_i)
            else:
                term = bit_i
            acc = term if acc is None else ri.add(sk, acc, term)
        # decrypt only the verdict, not the distance
        thr = ri.trivial_radix(params, jnp.asarray([threshold], dtype=jnp.uint64), 8)
        verdict = ri.le(sk, acc, thr)
        return bool(int(np.asarray(si.decrypt(ck, verdict))[0]) & 1)

    # genuine probe: a few bit flips
    probe_ok = template.copy()
    probe_ok[:3] ^= 1
    # impostor probe: random
    probe_bad = rs.integers(0, 2, size=bits)

    ok = match(probe_ok, threshold=10)
    bad = match(probe_bad, threshold=10)
    print(f"genuine probe accepted: {ok}")
    print(f"impostor probe accepted: {bad}")
    assert ok and not bad


if __name__ == "__main__":
    main()
