"""Radix integer ops vs clear math (the fhevm operator-corpus pattern:
encrypt -> op -> decrypt == clear op; reference e2e/test/fhevmOperations)."""

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
    return si.keygen(P, seed=41)


def _enc(ck, vals, nbits, seed=91):
    return ri.encrypt_radix(ck, jnp.asarray(vals, dtype=U64), nbits, FheRng(seed))


def _dec(ck, c):
    return np.asarray(ri.decrypt_radix(ck, c))


def test_encrypt_decrypt_roundtrip(keys):
    ck, _ = keys
    vals = [0, 1, 37, 255, 128]
    c = _enc(ck, vals, 8)
    np.testing.assert_array_equal(_dec(ck, c), vals)


def test_add_wraps(keys):
    ck, sk = keys
    a_v = np.array([3, 100, 255, 200], dtype=np.uint64)
    b_v = np.array([4, 27, 1, 200], dtype=np.uint64)
    c = ri.add(sk, _enc(ck, a_v, 8), _enc(ck, b_v, 8, seed=92))
    np.testing.assert_array_equal(_dec(ck, c), (a_v + b_v) % 256)


def test_sub_wraps(keys):
    ck, sk = keys
    a_v = np.array([10, 0, 255, 77], dtype=np.uint64)
    b_v = np.array([3, 1, 255, 200], dtype=np.uint64)
    c = ri.sub(sk, _enc(ck, a_v, 8), _enc(ck, b_v, 8, seed=93))
    np.testing.assert_array_equal(_dec(ck, c), (a_v - b_v) % 256)


def test_neg(keys):
    ck, sk = keys
    a_v = np.array([0, 1, 128, 255], dtype=np.uint64)
    c = ri.neg(sk, _enc(ck, a_v, 8))
    np.testing.assert_array_equal(_dec(ck, c), (-a_v.astype(np.int64)) % 256)


def test_bitwise(keys):
    ck, sk = keys
    a_v = np.array([0b10110100, 0b00001111], dtype=np.uint64)
    b_v = np.array([0b11000110, 0b01010101], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    b = _enc(ck, b_v, 8, seed=94)
    np.testing.assert_array_equal(_dec(ck, ri.bitand(sk, a, b)), a_v & b_v)
    np.testing.assert_array_equal(_dec(ck, ri.bitor(sk, a, b)), a_v | b_v)
    np.testing.assert_array_equal(_dec(ck, ri.bitxor(sk, a, b)), a_v ^ b_v)
    np.testing.assert_array_equal(_dec(ck, ri.bitnot(sk, a)), (~a_v) % 256)


def test_mul(keys):
    ck, sk = keys
    a_v = np.array([3, 15, 200, 255], dtype=np.uint64)
    b_v = np.array([5, 17, 3, 255], dtype=np.uint64)
    c = ri.mul(sk, _enc(ck, a_v, 8), _enc(ck, b_v, 8, seed=95))
    np.testing.assert_array_equal(_dec(ck, c), (a_v * b_v) % 256)


def test_eq_ne(keys):
    ck, sk = keys
    a_v = np.array([42, 42, 0, 255], dtype=np.uint64)
    b_v = np.array([42, 43, 0, 254], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    b = _enc(ck, b_v, 8, seed=96)
    e = ri.eq(sk, a, b)
    n = ri.ne(sk, a, b)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, e)), [1, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, n)), [0, 1, 0, 1])


def test_comparisons(keys):
    ck, sk = keys
    a_v = np.array([5, 200, 7, 7], dtype=np.uint64)
    b_v = np.array([9, 100, 7, 3], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    b = _enc(ck, b_v, 8, seed=97)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, ri.lt(sk, a, b))), a_v < b_v)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, ri.le(sk, a, b))), a_v <= b_v)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, ri.gt(sk, a, b))), a_v > b_v)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, ri.ge(sk, a, b))), a_v >= b_v)


def test_min_max_select(keys):
    ck, sk = keys
    a_v = np.array([5, 200, 7], dtype=np.uint64)
    b_v = np.array([9, 100, 7], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    b = _enc(ck, b_v, 8, seed=98)
    np.testing.assert_array_equal(_dec(ck, ri.min_(sk, a, b)), np.minimum(a_v, b_v))
    np.testing.assert_array_equal(_dec(ck, ri.max_(sk, a, b)), np.maximum(a_v, b_v))
    cond = ri.eq(sk, a, b)  # [0,0,1]
    sel = ri.select(sk, cond, a, b)
    np.testing.assert_array_equal(_dec(ck, sel), np.where(a_v == b_v, a_v, b_v))


@pytest.mark.parametrize("r", [0, 1, 2, 3, 7])
def test_shifts(keys, r):
    ck, sk = keys
    a_v = np.array([0b10110101, 0b00000001, 255], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    np.testing.assert_array_equal(_dec(ck, ri.shl(sk, a, r)), (a_v << r) % 256)
    np.testing.assert_array_equal(_dec(ck, ri.shr(sk, a, r)), a_v >> r)


def test_rotates(keys):
    ck, sk = keys
    a_v = np.array([0b10110101], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    for r in [1, 3, 8, 11]:
        got_l = _dec(ck, ri.rotl(sk, a, r))
        exp_l = ((a_v << (r % 8)) | (a_v >> (8 - r % 8))) % 256 if r % 8 else a_v
        np.testing.assert_array_equal(got_l, exp_l, err_msg=f"rotl {r}")
        got_r = _dec(ck, ri.rotr(sk, a, r))
        exp_r = ((a_v >> (r % 8)) | (a_v << (8 - r % 8))) % 256 if r % 8 else a_v
        np.testing.assert_array_equal(got_r, exp_r, err_msg=f"rotr {r}")


def test_cast(keys):
    ck, sk = keys
    a_v = np.array([200, 255], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    up = ri.cast(sk, a, 16)
    assert up.nbits == 16
    np.testing.assert_array_equal(_dec(ck, up), a_v)
    down = ri.cast(sk, ri.cast(sk, a, 16), 4)
    np.testing.assert_array_equal(_dec(ck, down), a_v % 16)


def test_scalar_ops(keys):
    ck, sk = keys
    a_v = np.array([100, 255], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    np.testing.assert_array_equal(_dec(ck, ri.scalar_add(sk, a, 200)), (a_v + 200) % 256)
    np.testing.assert_array_equal(_dec(ck, ri.scalar_mul(sk, a, 3)), (a_v * 3) % 256)
    np.testing.assert_array_equal(
        np.asarray(si.decrypt(ck, ri.scalar_lt(sk, a, 101))), a_v < 101
    )


def test_chained_ops(keys):
    """(a + b) * (a - b) == a^2 - b^2 mod 256 -- composition correctness."""
    ck, sk = keys
    a_v = np.array([13], dtype=np.uint64)
    b_v = np.array([7], dtype=np.uint64)
    a = _enc(ck, a_v, 8)
    b = _enc(ck, b_v, 8, seed=99)
    got = ri.mul(sk, ri.add(sk, a, b), ri.sub(sk, a, b))
    np.testing.assert_array_equal(_dec(ck, got), (a_v * a_v - b_v * b_v) % 256)


def test_add_sub_shared_chain(keys):
    """add_sub == (add, sub) with one stacked carry chain (the ERC20
    balance-update pair)."""
    ck, sk = keys
    a_v = np.array([200, 0, 255, 77], dtype=np.uint64)
    b_v = np.array([100, 1, 255, 200], dtype=np.uint64)
    s, d = ri.add_sub(sk, _enc(ck, a_v, 8), _enc(ck, b_v, 8, seed=95))
    np.testing.assert_array_equal(_dec(ck, s), (a_v + b_v) % 256)
    np.testing.assert_array_equal(_dec(ck, d), (a_v - b_v) % 256)


def test_select_trivial_zero_fast_path(keys):
    """select(cond, a, trivial 0) gates through the single-PBS path."""
    from tfhe_tpu.models import shortint as si2
    ck, sk = keys
    a_v = np.array([9, 250, 1, 0], dtype=np.uint64)
    cond = si2.encrypt(ck, jnp.asarray([1, 0, 1, 0], dtype=U64), FheRng(96))
    zero = ri.trivial_radix(P, jnp.zeros(4, dtype=U64), 8)
    out = ri.select(sk, cond, _enc(ck, a_v, 8), zero)
    np.testing.assert_array_equal(_dec(ck, out), [9, 0, 1, 0])
    out2 = ri.select(sk, cond, zero, _enc(ck, a_v, 8))
    np.testing.assert_array_equal(_dec(ck, out2), [0, 250, 0, 0])
