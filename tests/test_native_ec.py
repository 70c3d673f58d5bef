"""Native secp256k1 core vs the pure-Python ladder (the semantics
oracle). The C path (native/native.c tfhe_ec_mul/mul2/affine) backs
sign/recover in the serving loop; every operation must agree bit-for-bit
with the Python implementation it replaces."""

import numpy as np
import pytest

from tfhe_tpu import native
from tfhe_tpu.api import secp256k1 as ec

pytestmark = pytest.mark.skipif(
    not native.ec_available(), reason="no C compiler for the native layer"
)


def _py_mul(pt, k):
    """The module's double-and-add with the native dispatch bypassed."""
    k %= ec.N
    acc = (0, 1, 0)
    while k:
        if k & 1:
            acc = ec._add(acc, pt)
        pt = ec._dbl(pt)
        k >>= 1
    return acc


def _py_affine(pt):
    x, y, z = pt
    zi = ec._inv(z, ec.P)
    zi2 = zi * zi % ec.P
    return x * zi2 % ec.P, y * zi2 % ec.P * zi % ec.P


def test_native_mul_matches_ladder():
    rng = np.random.default_rng(5)
    for _ in range(40):
        k = int.from_bytes(rng.bytes(32), "big") % ec.N
        if k == 0:
            continue
        want = _py_affine(_py_mul(ec._G, k))
        got = native.ec_affine(native.ec_mul(ec._G, k))
        assert got == want


def test_native_mul_edges():
    for k in (1, 2, 3, ec.N - 1, ec.N - 2, (ec.N + 1) // 2):
        want = _py_affine(_py_mul(ec._G, k))
        assert native.ec_affine(native.ec_mul(ec._G, k)) == want
    # k = 0 and k = N give infinity
    for k in (0, ec.N):
        x, y, z = native.ec_mul(ec._G, k % ec.N)
        assert z == 0


def test_native_dual_mul():
    rng = np.random.default_rng(6)
    for t in range(15):
        k1 = int.from_bytes(rng.bytes(32), "big") % ec.N
        k2 = int.from_bytes(rng.bytes(32), "big") % ec.N
        p1 = _py_mul(ec._G, 11 + t)
        want = _py_affine(
            ec._add(_py_mul(p1, k1), _py_mul(ec._G, k2))
        )
        got = native.ec_affine(native.ec_mul2(p1, k1, ec._G, k2))
        assert got == want


def test_sign_recover_through_native():
    priv = ec.keygen(b"native-ec")
    digest = bytes(range(32))
    sig = ec.sign(priv, digest)
    assert ec.recover_address(digest, sig) == ec.address(priv)
    assert ec.verify(ec.pubkey(priv), digest, sig)
