"""fhevm operator corpus (C42 analog): op x width x scalar sweeps.

The reference pins integer-op semantics with 2,394 generated cases
(tests/fhevm-suite/e2e/test/fhevmOperations1-13.ts). This sweep covers
the same operator matrix with randomized vectors, batched so each
(op, width) pair is ONE device program over all test vectors.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.models import integer as ri
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng

P = tp.TOY_SHORTINT
N_VECERS = 4


@pytest.fixture(scope="module")
def keys():
    return si.keygen(P, seed=3)


def _enc(ck, vals, bits):
    return ri.encrypt_radix(ck, jnp.asarray(vals, dtype=jnp.uint64), bits, FheRng(9))


def _vals(bits, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**bits, size=N_VECERS, dtype=np.uint64)


BINARY = {
    "add": lambda a, b, m: (a + b) % m,
    "sub": lambda a, b, m: (a - b) % m,
    "mul": lambda a, b, m: (a * b) % m,
    "and": lambda a, b, m: a & b,
    "or": lambda a, b, m: a | b,
    "xor": lambda a, b, m: a ^ b,
    "min": lambda a, b, m: np.minimum(a, b),
    "max": lambda a, b, m: np.maximum(a, b),
}
BINARY_FNS = {
    "add": ri.add, "sub": ri.sub, "mul": ri.mul,
    "and": ri.bitand, "or": ri.bitor, "xor": ri.bitxor,
    "min": ri.min_, "max": ri.max_,
}
CMP = {
    "eq": np.equal, "ne": np.not_equal,
    "lt": np.less, "le": np.less_equal,
    "gt": np.greater, "ge": np.greater_equal,
}
CMP_FNS = {"eq": ri.eq, "ne": ri.ne, "lt": ri.lt, "le": ri.le, "gt": ri.gt, "ge": ri.ge}


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("op", sorted(BINARY))
def test_binary_ops(keys, bits, op):
    ck, sk = keys
    a = _vals(bits, hash((op, bits, 0)) % 2**31)
    b = _vals(bits, hash((op, bits, 1)) % 2**31)
    ea, eb = _enc(ck, a, bits), _enc(ck, b, bits)
    got = np.asarray(ri.decrypt_radix(ck, BINARY_FNS[op](sk, ea, eb)))
    want = BINARY[op](a.astype(object), b.astype(object), 2**bits).astype(np.uint64)
    np.testing.assert_array_equal(got, want, err_msg=f"{op}/{bits}")


@pytest.mark.parametrize("bits", [8])
@pytest.mark.parametrize("op", sorted(CMP))
def test_comparisons(keys, bits, op):
    ck, sk = keys
    a = _vals(bits, hash((op, bits, 2)) % 2**31)
    b = _vals(bits, hash((op, bits, 3)) % 2**31)
    # include an equality case
    b[0] = a[0]
    ea, eb = _enc(ck, a, bits), _enc(ck, b, bits)
    res = CMP_FNS[op](sk, ea, eb)
    got = np.asarray(si.decrypt(ck, res)) & 1
    want = CMP[op](a, b).astype(np.uint64)
    np.testing.assert_array_equal(got, want, err_msg=f"{op}/{bits}")


@pytest.mark.parametrize("op,left,rot", [
    ("shl", True, False), ("shr", False, False),
    ("rotl", True, True), ("rotr", False, True),
])
def test_shifts_scalar(keys, op, left, rot):
    ck, sk = keys
    bits = 8
    a = _vals(bits, 77)
    ea = _enc(ck, a, bits)
    r = 3
    got = np.asarray(ri.decrypt_radix(ck, getattr(ri, op)(sk, ea, r)))
    if rot:
        want = ((a << r) | (a >> (bits - r))) % 2**bits if left else (
            (a >> r) | (a << (bits - r))
        ) % 2**bits
    else:
        want = (a << r) % 2**bits if left else a >> r
    np.testing.assert_array_equal(got, want.astype(np.uint64), err_msg=op)


def test_scalar_variants(keys):
    ck, sk = keys
    a = _vals(8, 5)
    ea = _enc(ck, a, 8)
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.scalar_add(sk, ea, 77))),
        (a + 77) % 256,
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.scalar_mul(sk, ea, 3))),
        (a * 3) % 256,
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.scalar_div(sk, ea, 5))), a // 5
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.scalar_rem(sk, ea, 5))), a % 5
    )


def test_unary_and_select(keys):
    ck, sk = keys
    a = _vals(8, 6)
    b = _vals(8, 7)
    ea, eb = _enc(ck, a, 8), _enc(ck, b, 8)
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.bitnot(sk, ea))), (~a) % 256
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.neg(sk, ea))), (-a) % 256
    )
    cond = ri.lt(sk, ea, eb)
    sel = ri.select(sk, cond, ea, eb)  # min
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, sel)), np.minimum(a, b)
    )


def test_cast_up_down(keys):
    ck, sk = keys
    a = _vals(8, 8)
    ea = _enc(ck, a, 8)
    up = ri.cast(sk, ea, 16)
    assert up.nbits == 16
    np.testing.assert_array_equal(np.asarray(ri.decrypt_radix(ck, up)), a)
    down = ri.cast(sk, up, 4)
    np.testing.assert_array_equal(np.asarray(ri.decrypt_radix(ck, down)), a % 16)


def test_euint32_add_mul(keys):
    ck, sk = keys
    a = _vals(32, 11)[:2]
    b = _vals(32, 12)[:2]
    ea, eb = _enc(ck, a, 32), _enc(ck, b, 32)
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.add(sk, ea, eb))),
        (a + b) % 2**32,
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.mul(sk, ea, eb))),
        (a.astype(object) * b.astype(object) % 2**32).astype(np.uint64),
    )


def test_server_key_serialization_roundtrip(keys):
    """Checkpoint/resume of key material (SURVEY.md section 5): a
    deserialized server key must bootstrap identically."""
    from tfhe_tpu.utils import serialization

    ck, sk = keys
    blob = serialization.serialize(sk)
    sk2 = serialization.deserialize(blob)
    a = _vals(8, 13)
    b = _vals(8, 14)
    ea, eb = _enc(ck, a, 8), _enc(ck, b, 8)
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.add(sk2, ea, eb))),
        (a + b) % 256,
    )
