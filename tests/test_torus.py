"""Torus arithmetic: encode/decode, signed decomposition, mod switch."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import GadgetParams
from tfhe_tpu.torus import (
    decode,
    decode_signed,
    encode,
    mod_switch,
    negacyclic_monomial_rotate,
    recompose,
    signed_decompose,
)

U64 = jnp.uint64


def test_encode_decode_roundtrip():
    delta = 2**59  # 2-bit msg + 2-bit carry + padding
    msgs = jnp.arange(16, dtype=jnp.uint64)
    pts = encode(msgs, delta)
    np.testing.assert_array_equal(np.asarray(decode(pts, delta, 16)), np.arange(16))


def test_decode_tolerates_noise_below_half_delta():
    delta = 2**59
    noise = jnp.array([delta // 2 - 1, -(delta // 2) + 1], dtype=jnp.int64).astype(U64)
    pts = encode(jnp.array([3, 3], dtype=U64), delta) + noise
    np.testing.assert_array_equal(np.asarray(decode(pts, delta, 16)), [3, 3])


def test_decode_signed():
    delta = 2**59
    v = decode_signed(encode(jnp.array([15], dtype=U64), delta), delta, 16)
    assert int(v[0]) == -1


def test_signed_decompose_reconstructs_rounded():
    g = GadgetParams(base_log=7, level=3)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(0, 2**64, size=1000, dtype=np.uint64))
    d = signed_decompose(x, g)
    # digits bounded by B/2
    dv = np.asarray(d).astype(np.int64)
    assert np.abs(dv).max() <= 2**6
    rec = np.asarray(recompose(d, g)).astype(np.uint64)
    # reconstruction equals x rounded to the top level*base_log bits
    err = (rec - np.asarray(x)).astype(np.int64)
    assert np.abs(err).max() <= 2 ** (64 - 21 - 1)


def test_signed_decompose_exact_on_representable():
    g = GadgetParams(base_log=8, level=2)
    # values that are exact multiples of q / B^level
    rs = np.random.RandomState(1)
    tops = rs.randint(0, 2**16, size=200).astype(np.uint64)
    x = jnp.asarray(tops << np.uint64(48))
    rec = recompose(signed_decompose(x, g), g)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_mod_switch():
    # q/2 -> N under mod 2N
    x = jnp.array([2**63, 0, 2**63 + 2**53], dtype=U64)
    got = np.asarray(mod_switch(x, 12))  # 2N = 4096
    assert got[0] == 2048 and got[1] == 0 and got[2] == 2050


def test_monomial_rotate_matches_reference():
    n = 16
    rs = np.random.RandomState(2)
    poly = rs.randint(0, 2**64, size=n, dtype=np.uint64)
    for r in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
        got = np.asarray(
            negacyclic_monomial_rotate(jnp.asarray(poly), jnp.array(r))
        )
        expected = np.zeros(n, dtype=np.uint64)
        for t in range(n):
            e = (t + r) % (2 * n)
            if e < n:
                expected[e] = np.uint64((int(expected[e]) + int(poly[t])) % 2**64)
            else:
                expected[e - n] = np.uint64(
                    (int(expected[e - n]) - int(poly[t])) % 2**64
                )
        np.testing.assert_array_equal(got, expected, err_msg=f"r={r}")


def test_monomial_rotate_batched_amounts():
    n = 8
    poly = jnp.arange(1, n + 1, dtype=U64)
    r = jnp.array([0, 1], dtype=U64)
    got = negacyclic_monomial_rotate(poly, r)
    assert got.shape == (2, n)
    np.testing.assert_array_equal(np.asarray(got[0]), np.arange(1, n + 1))
    # X * poly: shift up, last coeff wraps negated
    exp = np.roll(np.arange(1, n + 1, dtype=np.uint64), 1)
    exp[0] = np.uint64(-8 % 2**64)
    np.testing.assert_array_equal(np.asarray(got[1]), exp)
