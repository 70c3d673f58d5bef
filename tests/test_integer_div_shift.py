"""Division, remainder and encrypted-amount shifts vs clear math."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.models import integer as ri
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng

P = params.TOY_SHORTINT
U64 = jnp.uint64


@pytest.fixture(scope="module")
def keys():
    return si.keygen(P, seed=81)


def _enc(ck, vals, nbits, seed=181):
    return ri.encrypt_radix(ck, jnp.asarray(vals, dtype=U64), nbits, FheRng(seed))


def test_div_rem(keys):
    ck, sk = keys
    a_v = np.array([100, 255, 7, 13], dtype=np.uint64)
    b_v = np.array([7, 16, 9, 1], dtype=np.uint64)
    q, r = ri.div_rem(sk, _enc(ck, a_v, 8), _enc(ck, b_v, 8, seed=182))
    np.testing.assert_array_equal(np.asarray(ri.decrypt_radix(ck, q)), a_v // b_v)
    np.testing.assert_array_equal(np.asarray(ri.decrypt_radix(ck, r)), a_v % b_v)


def test_div_by_zero_semantics(keys):
    """tfhe-rs semantics: x/0 = MAX, x%0 = x."""
    ck, sk = keys
    a_v = np.array([42], dtype=np.uint64)
    q, r = ri.div_rem(sk, _enc(ck, a_v, 8), _enc(ck, [0], 8, seed=183))
    assert int(ri.decrypt_radix(ck, q)[0]) == 255
    assert int(ri.decrypt_radix(ck, r)[0]) == 42


def test_extract_bits(keys):
    ck, sk = keys
    a = _enc(ck, [0b10110100], 8)
    bits = ri.extract_bits(sk, a)
    got = [
        int(np.asarray(si.decrypt(ck, si.Ciphertext(ct=b, params=P, degree=1, noise_level=1)))[0])
        for b in bits
    ]
    assert got == [0, 0, 1, 0, 1, 1, 0, 1]  # LSB first


def test_encrypted_shifts(keys):
    ck, sk = keys
    a_v = np.array([0b10110101, 0b10110101], dtype=np.uint64)
    amt_v = np.array([3, 11], dtype=np.uint64)  # 11 % 8 = 3
    a = _enc(ck, a_v, 8)
    amt = _enc(ck, amt_v, 8, seed=184)
    eff = amt_v % 8
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.shl_enc(sk, a, amt))),
        (a_v << eff) % 256,
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.shr_enc(sk, a, amt))), a_v >> eff
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.rotl_enc(sk, a, amt))),
        ((a_v << eff) | (a_v >> (8 - eff))) % 256,
    )
