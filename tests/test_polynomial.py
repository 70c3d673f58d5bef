"""NTT / negacyclic polymul exactness tests vs Python-int ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.polynomial import (
    DEFAULT_PRIMES,
    NegacyclicEngine,
    _ntt_tables,
    fntt,
    get_engine,
    intt,
    negacyclic_polymul_reference,
)

U64 = jnp.uint64


@pytest.mark.parametrize("p", DEFAULT_PRIMES)
@pytest.mark.parametrize("n", [16, 256])
def test_ntt_roundtrip(p, n):
    psi, psi_inv, n_inv = _ntt_tables(p, n)
    rs = np.random.RandomState(1)
    a = jnp.asarray(rs.randint(0, p, size=(3, n)).astype(np.uint64))
    f = fntt(a, jnp.asarray(psi), U64(p))
    back = intt(f, jnp.asarray(psi_inv), U64(n_inv), U64(p))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


@pytest.mark.parametrize("p", DEFAULT_PRIMES)
def test_ntt_negacyclic_convolution_mod_p(p):
    """Pointwise product in NTT domain == negacyclic convolution mod p."""
    n = 64
    psi, psi_inv, n_inv = _ntt_tables(p, n)
    rs = np.random.RandomState(2)
    a = rs.randint(0, p, size=n).astype(np.uint64)
    b = rs.randint(0, p, size=n).astype(np.uint64)
    fa = fntt(jnp.asarray(a), jnp.asarray(psi), U64(p))
    fb = fntt(jnp.asarray(b), jnp.asarray(psi), U64(p))
    prod = (fa * fb) % U64(p)
    conv = intt(prod, jnp.asarray(psi_inv), U64(n_inv), U64(p))
    expected = negacyclic_polymul_reference(a, b, q=p).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(conv), expected)


@pytest.mark.parametrize("n", [64, 256])
def test_polymul_small_x_u64_exact(n):
    """small signed poly x uniform u64 poly, exact mod 2^64 (the CRT
    contract: N * |a| * 2^64 below the 3-prime range)."""
    eng = get_engine(n)
    rs = np.random.RandomState(3)
    a = rs.randint(-(2**15), 2**15, size=(2, n)).astype(np.int64)
    b = rs.randint(0, 2**64, size=(2, n), dtype=np.uint64)
    got = eng.polymul(jnp.asarray(a), jnp.asarray(b))
    for i in range(2):
        expected = negacyclic_polymul_reference(a[i], b[i])
        np.testing.assert_array_equal(
            np.asarray(got[i]), expected.astype(np.uint64)
        )


def test_polymul_digits_x_modswitched_key():
    """Gadget-digit magnitudes (2^22) against 44-bit key values: the
    bootstrap-key configuration."""
    n = 256
    eng = get_engine(n)
    rs = np.random.RandomState(8)
    a = rs.randint(-(2**22), 2**22, size=n).astype(np.int64)
    b = rs.randint(0, 2**44, size=n, dtype=np.uint64)
    got = eng.polymul(jnp.asarray(a), jnp.asarray(b))
    expected = negacyclic_polymul_reference(a, b)
    np.testing.assert_array_equal(np.asarray(got), expected.astype(np.uint64))


def test_polymul_binary_secret():
    """binary poly x u64 poly (the GLWE mask*secret product)."""
    n = 128
    eng = get_engine(n)
    rs = np.random.RandomState(4)
    s = rs.randint(0, 2, size=n).astype(np.int64)
    m = rs.randint(0, 2**64, size=n, dtype=np.uint64)
    got = eng.polymul(jnp.asarray(s), jnp.asarray(m))
    expected = negacyclic_polymul_reference(s, m)
    np.testing.assert_array_equal(np.asarray(got), expected.astype(np.uint64))


def test_polymul_max_magnitude_guard():
    """Engine reports its product headroom and is exact at the edge."""
    n = 256
    eng = get_engine(n)
    assert eng.max_product_bits >= 83  # prod/2 / N for the 3-prime CRT
    hi = 2 ** (eng.max_product_bits - 64)  # max |a| against full-u64 b
    rs = np.random.RandomState(5)
    a = rs.randint(-hi, hi, size=n).astype(np.int64)
    a[0] = hi - 1
    a[1] = -(hi - 1)
    b = np.full(n, 2**64 - 1, dtype=np.uint64)
    got = eng.polymul(jnp.asarray(a), jnp.asarray(b))
    expected = negacyclic_polymul_reference(a, b)
    np.testing.assert_array_equal(np.asarray(got), expected.astype(np.uint64))


def test_forward_small_accepts_u64_twos_complement():
    n = 64
    eng = get_engine(n)
    a_signed = np.array([-5, 3] + [0] * (n - 2), dtype=np.int64)
    a_u64 = a_signed.astype(np.uint64)  # two's complement view
    b = np.arange(n, dtype=np.uint64) * np.uint64(2**40)
    got1 = eng.polymul(jnp.asarray(a_signed), jnp.asarray(b))
    got2 = eng.polymul(jnp.asarray(a_u64), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))


def test_transform_domain_accumulation():
    """sum_i a_i * b_i computed with one backward == sum of polymuls."""
    n = 64
    eng = get_engine(n)
    rs = np.random.RandomState(6)
    a = rs.randint(-(2**10), 2**10, size=(3, n)).astype(np.int64)
    b = rs.randint(0, 2**64, size=(3, n), dtype=np.uint64)
    fa = eng.forward_small(jnp.asarray(a))
    fb = eng.forward_u64(jnp.asarray(b))
    prods = eng.pointwise_mul(fa, fb)
    acc = prods[0]
    for i in range(1, 3):
        acc = eng.add_domain(acc, prods[i])
    got = eng.backward(acc)
    expected = sum(
        negacyclic_polymul_reference(a[i], b[i]) for i in range(3)
    ) % (2**64)
    np.testing.assert_array_equal(np.asarray(got), expected.astype(np.uint64))
