"""Folded four-step NTT engine: exactness against Python-integer ground
truth and against the legacy CRT engine (ops/polynomial.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.folded_ntt import (
    FOLDED_PRIMES,
    FoldedCrtEngine,
    FoldedNtt,
    get_folded_engine,
)
from tfhe_tpu.ops.polynomial import negacyclic_polymul_reference


@pytest.mark.parametrize("n", [16, 64, 256])
@pytest.mark.parametrize("p", list(FOLDED_PRIMES))
def test_roundtrip_single_prime(n, p):
    ntt = FoldedNtt(p, n)
    rng = np.random.default_rng(0)
    x = rng.integers(0, p, size=(3, n), dtype=np.uint64).astype(np.int64)
    f = ntt.forward_signed(jnp.asarray(x, dtype=jnp.int32))
    back = np.asarray(ntt.inverse(f))
    np.testing.assert_array_equal(back, x.astype(np.uint32))


@pytest.mark.parametrize("n", [64, 256])
def test_single_prime_convolution(n):
    """forward/pointwise/inverse == negacyclic convolution mod p."""
    p = FOLDED_PRIMES[0]
    ntt = FoldedNtt(p, n)
    rng = np.random.default_rng(1)
    a = rng.integers(-1000, 1000, size=(n,))
    b = rng.integers(0, p, size=(n,), dtype=np.uint64)
    fa = ntt.forward_signed(jnp.asarray(a, dtype=jnp.int32))
    fb = ntt.forward_signed(jnp.asarray(b.astype(np.int64), dtype=jnp.int32))
    # generic mulmod via engine helper on a single-prime basis
    from tfhe_tpu.ops.folded_ntt import _condsub, _mulhi_u32

    av = _condsub(fa, ntt.ctx.pu)
    bv = _condsub(fb, ntt.ctx.pu)
    lo = av * bv
    hi = _mulhi_u32(av, bv)
    prod = ntt.ctx.reduce_u64_pair(lo, hi)
    out = np.asarray(ntt.inverse(prod))
    ref = negacyclic_polymul_reference(a, b, q=p)
    np.testing.assert_array_equal(out, np.array([int(v) for v in ref]))


@pytest.mark.parametrize("n", [64, 2048])
def test_polymul_mod_2_64(n):
    """Full CRT engine: (small) x (u64) negacyclic product mod 2^64."""
    eng = get_folded_engine(n)
    rng = np.random.default_rng(2)
    # full-u64 operands pair with small a: N*|a|*2^64 < 2^87 CRT range
    a = rng.integers(-(2**9), 2**9, size=(n,))
    b = rng.integers(0, 2**64, size=(n,), dtype=np.uint64)
    out = np.asarray(eng.polymul(jnp.asarray(a), jnp.asarray(b)))
    ref = negacyclic_polymul_reference(a, b, q=2**64)
    np.testing.assert_array_equal(out, np.array([int(v) for v in ref], dtype=np.uint64))


def test_polymul_matches_legacy_engine():
    from tfhe_tpu.ops.polynomial import get_engine

    n = 128
    legacy = get_engine(n, ntt_impl="radix2")
    folded = get_folded_engine(n)
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**12), 2**12, size=(2, n))
    b = rng.integers(0, 2**64, size=(2, n), dtype=np.uint64)
    np.testing.assert_array_equal(
        np.asarray(folded.polymul(jnp.asarray(a), jnp.asarray(b))),
        np.asarray(legacy.polymul(jnp.asarray(a), jnp.asarray(b))),
    )


def test_shoup_key_path():
    """make_shoup + pointwise_shoup == generic pointwise_mul."""
    n = 64
    eng = get_folded_engine(n)
    rng = np.random.default_rng(4)
    a = rng.integers(-(2**10), 2**10, size=(3, n))
    b = rng.integers(0, 2**64, size=(n,), dtype=np.uint64)
    fa = eng.forward_small(jnp.asarray(a))
    fb = eng.forward_u64(jnp.asarray(b))
    key = eng.make_shoup(fb)
    out_shoup = eng.backward(eng.pointwise_shoup(fa, key))
    out_generic = eng.backward(eng.pointwise_mul(fa, fb))
    np.testing.assert_array_equal(np.asarray(out_shoup), np.asarray(out_generic))


def test_shifted_backward_and_accumulate():
    """add_domain accumulation + shift matches reference sum of products."""
    n = 64
    eng = get_folded_engine(n)
    rng = np.random.default_rng(5)
    a1 = rng.integers(-(2**10), 2**10, size=(n,))
    a2 = rng.integers(-(2**10), 2**10, size=(n,))
    b1 = rng.integers(0, 2**44, size=(n,), dtype=np.uint64)
    b2 = rng.integers(0, 2**44, size=(n,), dtype=np.uint64)
    f = eng.add_domain(
        eng.pointwise_mul(eng.forward_small(jnp.asarray(a1)), eng.forward_u64(jnp.asarray(b1))),
        eng.pointwise_mul(eng.forward_small(jnp.asarray(a2)), eng.forward_u64(jnp.asarray(b2))),
    )
    out = np.asarray(eng.backward(f, shift=20))
    ref1 = negacyclic_polymul_reference(a1, b1, q=2**64)
    ref2 = negacyclic_polymul_reference(a2, b2, q=2**64)
    ref = np.array(
        [(int(x) + int(y)) << 20 & (2**64 - 1) for x, y in zip(ref1, ref2)],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(out, ref)


def test_max_product_bits_covers_bootstrap():
    eng = get_folded_engine(2048)
    # 23-bit gadget digits x 44-bit keys (max_product_bits already
    # accounts for the N-fold convolution sum)
    assert eng.max_product_bits >= 22 + 44
