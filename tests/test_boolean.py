"""Boolean gate bootstrapping: full truth tables for every gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.models import boolean as fb
from tfhe_tpu.rng import FheRng

P = params.TOY_BOOLEAN


@pytest.fixture(scope="module")
def keys():
    return fb.keygen(P, seed=31)


def test_encrypt_decrypt(keys):
    ck, _ = keys
    rng = FheRng(1)
    bits = jnp.asarray([0, 1, 1, 0], dtype=jnp.uint64)
    ct = fb.encrypt(ck, bits, rng)
    np.testing.assert_array_equal(np.asarray(fb.decrypt(ck, ct)), [False, True, True, False])


def test_all_binary_gates_truth_tables(keys):
    ck, sk = keys
    rng = FheRng(2)
    a_bits = jnp.asarray([0, 0, 1, 1], dtype=jnp.uint64)
    b_bits = jnp.asarray([0, 1, 0, 1], dtype=jnp.uint64)
    a = fb.encrypt(ck, a_bits, rng)
    b = fb.encrypt(ck, b_bits, rng)
    expected = {
        "and": [0, 0, 0, 1],
        "or": [0, 1, 1, 1],
        "xor": [0, 1, 1, 0],
        "nand": [1, 1, 1, 0],
        "nor": [1, 0, 0, 0],
        "xnor": [1, 0, 0, 1],
    }
    got = {
        "and": fb.and_(sk, a, b),
        "or": fb.or_(sk, a, b),
        "xor": fb.xor_(sk, a, b),
        "nand": fb.nand(sk, a, b),
        "nor": fb.nor(sk, a, b),
        "xnor": fb.xnor(sk, a, b),
    }
    for name, ct in got.items():
        np.testing.assert_array_equal(
            np.asarray(fb.decrypt(ck, ct)).astype(int),
            expected[name],
            err_msg=name,
        )


def test_not_is_free(keys):
    ck, sk = keys
    rng = FheRng(3)
    a = fb.encrypt(ck, jnp.asarray([0, 1], dtype=jnp.uint64), rng)
    np.testing.assert_array_equal(
        np.asarray(fb.decrypt(ck, fb.not_(sk, a))), [True, False]
    )


def test_mux(keys):
    ck, sk = keys
    rng = FheRng(4)
    c = fb.encrypt(ck, jnp.asarray([0, 0, 1, 1], dtype=jnp.uint64), rng)
    t = fb.encrypt(ck, jnp.asarray([0, 1, 0, 1], dtype=jnp.uint64), rng)
    f = fb.encrypt(ck, jnp.asarray([1, 0, 1, 0], dtype=jnp.uint64), rng)
    out = fb.mux(sk, c, t, f)
    np.testing.assert_array_equal(
        np.asarray(fb.decrypt(ck, out)).astype(int), [1, 0, 0, 1]
    )


def test_gate_chaining(keys):
    """(a AND b) XOR (a OR b) == a XOR b -- noise survives chained gates."""
    ck, sk = keys
    rng = FheRng(5)
    a = fb.encrypt(ck, jnp.asarray([0, 0, 1, 1], dtype=jnp.uint64), rng)
    b = fb.encrypt(ck, jnp.asarray([0, 1, 0, 1], dtype=jnp.uint64), rng)
    lhs = fb.xor_(sk, fb.and_(sk, a, b), fb.or_(sk, a, b))
    np.testing.assert_array_equal(
        np.asarray(fb.decrypt(ck, lhs)).astype(int), [0, 1, 1, 0]
    )
