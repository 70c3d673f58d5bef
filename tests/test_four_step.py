"""Four-step MXU NTT: exactness vs the radix-2 reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.polynomial import (
    DEFAULT_PRIMES,
    FourStepNtt,
    NegacyclicEngine,
    negacyclic_polymul_reference,
)

U64 = jnp.uint64


@pytest.mark.parametrize("p", DEFAULT_PRIMES)
@pytest.mark.parametrize("n", [16, 128, 2048])
def test_four_step_roundtrip(p, n):
    ntt = FourStepNtt(p, n)
    rs = np.random.RandomState(n)
    x = jnp.asarray(rs.randint(0, p, size=(3, n)).astype(np.uint64))
    back = ntt.backward(ntt.forward(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("p", DEFAULT_PRIMES)
def test_four_step_convolution(p):
    """pointwise product in four-step domain == negacyclic convolution."""
    n = 64
    ntt = FourStepNtt(p, n)
    rs = np.random.RandomState(7)
    a = rs.randint(0, p, size=n).astype(np.uint64)
    b = rs.randint(0, p, size=n).astype(np.uint64)
    fa = ntt.forward(jnp.asarray(a))
    fb = ntt.forward(jnp.asarray(b))
    conv = ntt.backward((fa * fb) % U64(p))
    expected = negacyclic_polymul_reference(a, b, q=p).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(conv), expected)


def test_engine_four_step_polymul_exact():
    eng = NegacyclicEngine(2048, ntt_impl="four_step")
    assert eng.ntt_impl == "four_step"
    rs = np.random.RandomState(9)
    a = rs.randint(-(2**15), 2**15, size=2048).astype(np.int64)
    b = rs.randint(0, 2**64, size=2048, dtype=np.uint64)
    got = np.asarray(eng.polymul(jnp.asarray(a), jnp.asarray(b)))
    # independent check against the radix-2 engine (ground truth already
    # verified against python ints in test_polynomial)
    ref_eng = NegacyclicEngine(2048, ntt_impl="radix2")
    ref = np.asarray(ref_eng.polymul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, ref)
