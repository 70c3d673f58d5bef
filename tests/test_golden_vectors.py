"""Golden-vector regression gates (VERDICT round-1 item 4).

tests/golden_vectors.json pins exact hashes of the deterministic
streams: RNG draws, NTT outputs, key material, ciphertexts, PBS
outputs, radix op results. Any unintentional change to the RNG,
encodings, NTT tables, or parameter constants flips a hash here.
Regenerate with scripts/gen_golden_vectors.py ONLY for intentional
format changes (reference pattern: ml/extensions tests pin interop
round-trips; BASELINE.json bit-exact clause).
"""

import hashlib
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.models import integer as ri
from tfhe_tpu.models import shortint as si
from tfhe_tpu.ops import folded_ntt
from tfhe_tpu.rng import FheRng

VEC = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_vectors.json"))
)


def sha(arr) -> str:
    a = np.asarray(arr)
    return hashlib.sha256(
        a.tobytes() + str(a.shape).encode() + str(a.dtype).encode()
    ).hexdigest()


def test_rng_stream():
    rng = FheRng(1234)
    got = [int(x) for x in np.asarray(rng.uniform_torus((8,)))]
    assert got == VEC["rng"]["uniform_torus_8"]
    got = [int(x) for x in np.asarray(rng.binary((16,)))]
    assert got == VEC["rng"]["binary_16"]
    got = [int(x) for x in np.asarray(rng.tuniform(10, (8,)))]
    assert got == VEC["rng"]["tuniform10_8"]


def test_ntt_2048_exact():
    eng = folded_ntt.FoldedCrtEngine(2048)
    assert [int(p) for p in eng.primes] == VEC["ntt2048"]["primes"]
    poly = jnp.asarray((np.arange(2048) * 7 + 3) % 1000 - 500, dtype=jnp.int32)
    f = np.asarray(eng.forward_small(poly))
    assert [int(x) for x in f[0, :8]] == VEC["ntt2048"]["fwd_head"]
    assert sha(f) == VEC["ntt2048"]["fwd_sha"]


def test_toy_keys_and_encrypt():
    P = tp.TOY_SHORTINT
    ck, sk = si.keygen(P, seed=7)
    assert sha(ck.lwe_key.key) == VEC["toy_keys"]["lwe_key_sha"]
    assert sha(ck.glwe_key.key) == VEC["toy_keys"]["glwe_key_sha"]
    assert sha(sk.bsk.bsk_ntt) == VEC["toy_keys"]["bsk_sha"]
    assert sha(sk.ksk.ksk) == VEC["toy_keys"]["ksk_sha"]
    c = si.encrypt(ck, jnp.arange(4, dtype=jnp.uint64), FheRng(99))
    assert sha(c.ct) == VEC["toy_encrypt"]["ct_sha"]
    assert [int(x) for x in np.asarray(si.decrypt(ck, c))] == VEC["toy_encrypt"]["decrypt"]
    boot = si.apply_function(sk, c, lambda v: (v * 3 + 1) % 4)
    assert sha(boot.ct) == VEC["toy_pbs"]["ct_sha"]
    assert [int(x) for x in np.asarray(si.decrypt(ck, boot))] == VEC["toy_pbs"]["decrypt"]


def test_toy_radix_ops():
    PN = tp.TOY_SHORTINT_NOISELESS
    ck2, sk2 = si.keygen(PN, seed=8)
    a8 = ri.encrypt_radix(ck2, jnp.asarray([177, 23], dtype=jnp.uint64), 8, FheRng(5))
    b8 = ri.encrypt_radix(ck2, jnp.asarray([99, 201], dtype=jnp.uint64), 8, FheRng(6))
    assert sha(ri.add(sk2, a8, b8).blocks) == VEC["toy_radix"]["add_sha"]
    got = [int(x) for x in np.asarray(ri.decrypt_radix(ck2, ri.mul(sk2, a8, b8)))]
    assert got == VEC["toy_radix"]["mul_decrypt"]


def test_fhevm_param_constants_pinned():
    PF = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    assert PF.hash == VEC["fhevm_params"]["hash"]
    assert PF.delta == VEC["fhevm_params"]["delta"]
    assert PF.lwe_dimension == VEC["fhevm_params"]["n"]
    assert PF.polynomial_size == VEC["fhevm_params"]["N"]


def test_full_params_pbs_decrypt():
    """One shortint op chain at the FULL fhevm parameter set on CPU.
    In the DEFAULT gate (round-2 verdict weak #5: production noise
    margins must be exercised on every run, not only under RUN_SLOW) --
    ~73 s on CPU, the one deliberately slow default-tier test."""
    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    ck, sk = si.keygen(P, seed=1)
    rng = FheRng(2)
    vals = jnp.asarray([0, 1, 2, 3], dtype=jnp.uint64)
    c = si.encrypt(ck, vals, rng)
    boot = si.apply_function(sk, c, lambda v: (v + 1) % 4)
    got = np.asarray(si.decrypt(ck, boot))
    np.testing.assert_array_equal(got, (np.arange(4) + 1) % 4)


@pytest.mark.slow
def test_full_params_radix_add():
    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    ck, sk = si.keygen(P, seed=1)
    a = ri.encrypt_radix(ck, jnp.asarray([200], dtype=jnp.uint64), 8, FheRng(3))
    b = ri.encrypt_radix(ck, jnp.asarray([100], dtype=jnp.uint64), 8, FheRng(4))
    got = int(np.asarray(ri.decrypt_radix(ck, ri.add(sk, a, b)))[0])
    assert got == (200 + 100) % 256
