"""Shortint layer: encrypt/decrypt, LUT application, add/mul/carry ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng

P = params.TOY_SHORTINT


@pytest.fixture(scope="module")
def keys():
    return si.keygen(P, seed=21)


@pytest.fixture()
def enc_rng():
    return FheRng(77)


def test_encrypt_decrypt(keys, enc_rng):
    ck, _ = keys
    vals = jnp.asarray([0, 1, 2, 3], dtype=jnp.uint64)
    c = si.encrypt(ck, vals, enc_rng)
    np.testing.assert_array_equal(np.asarray(si.decrypt_message(ck, c)), [0, 1, 2, 3])


def test_add_with_carry_visible(keys, enc_rng):
    ck, _ = keys
    a = si.encrypt(ck, jnp.asarray([3, 2], dtype=jnp.uint64), enc_rng)
    b = si.encrypt(ck, jnp.asarray([3, 1], dtype=jnp.uint64), enc_rng)
    c = si.add(a, b)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, c)), [6, 3])
    np.testing.assert_array_equal(np.asarray(si.decrypt_message(ck, c)), [2, 3])


def test_message_and_carry_extract(keys, enc_rng):
    ck, sk = keys
    a = si.encrypt(ck, jnp.asarray([3, 1], dtype=jnp.uint64), enc_rng)
    b = si.encrypt(ck, jnp.asarray([2, 1], dtype=jnp.uint64), enc_rng)
    s = si.add(a, b)  # 5, 2
    msg = si.message_extract(sk, s)
    car = si.carry_extract(sk, s)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, msg)), [1, 2])
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, car)), [1, 0])
    assert msg.degree == 3 and car.degree <= 3


def test_apply_function(keys, enc_rng):
    ck, sk = keys
    a = si.encrypt(ck, jnp.asarray([0, 1, 2, 3], dtype=jnp.uint64), enc_rng)
    out = si.apply_function(sk, a, lambda v: (v * v + 1) % 4)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, out)), [1, 2, 1, 2])


def test_neg_and_sub(keys, enc_rng):
    ck, sk = keys
    a = si.encrypt(ck, jnp.asarray([3, 0], dtype=jnp.uint64), enc_rng)
    n = si.neg(a)
    np.testing.assert_array_equal(np.asarray(si.decrypt_message(ck, n)), [1, 0])
    b = si.encrypt(ck, jnp.asarray([1, 2], dtype=jnp.uint64), enc_rng)
    d = si.sub(a, b)
    np.testing.assert_array_equal(np.asarray(si.decrypt_message(ck, d)), [2, 2])


def test_bivariate_mul(keys, enc_rng):
    ck, sk = keys
    av = np.array([0, 1, 2, 3, 3])
    bv = np.array([3, 3, 3, 2, 3])
    a = si.encrypt(ck, jnp.asarray(av, dtype=jnp.uint64), enc_rng)
    b = si.encrypt(ck, jnp.asarray(bv, dtype=jnp.uint64), enc_rng)
    prod = si.mul(sk, a, b)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, prod)), av * bv)


def test_degree_guard(keys, enc_rng):
    ck, sk = keys
    a = si.encrypt(ck, jnp.asarray([1], dtype=jnp.uint64), enc_rng)
    for _ in range(4):
        a = si.add(a, a)
    with pytest.raises(AssertionError):
        si.apply_function(sk, a, lambda v: v)


def test_trivial_encrypt(keys):
    ck, sk = keys
    t = si.trivial_encrypt(P, jnp.asarray([2], dtype=jnp.uint64))
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, t)), [2])
