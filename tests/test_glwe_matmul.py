"""Encrypted-clear matmul vs numpy ground truth (the reference's
test_correctness.py pattern: parametrized dims x signedness)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.models import glwe_matmul as gm
from tfhe_tpu.rng import FheRng

P = params.TOY_MATMUL


@pytest.fixture(scope="module")
def pkey():
    return gm.create_private_key(P, seed=71)


@pytest.mark.parametrize(
    "r,c,o,signed",
    [
        (2, 16, 3, False),
        (1, 256, 4, False),  # inner dim == N (one full chunk)
        (3, 300, 5, True),  # multi-chunk inner dim, signed weights
    ],
)
def test_matmul_matches_numpy(pkey, r, c, o, signed):
    rs = np.random.RandomState(c)
    x = rs.randint(0, 16, size=(r, c)).astype(np.uint64)
    lo = -8 if signed else 0
    w = rs.randint(lo, 8, size=(c, o)).astype(np.int64)
    enc = gm.encrypt_matrix(pkey, jnp.asarray(x), seed=c)
    res = gm.matrix_multiplication(enc, jnp.asarray(w), pkey)
    got = np.asarray(gm.decrypt_matrix(res, pkey))
    expected = x.astype(np.int64) @ w
    np.testing.assert_array_equal(got, expected)


def test_compressed_storage_is_narrow(pkey):
    rs = np.random.RandomState(0)
    x = rs.randint(0, 4, size=(2, 16)).astype(np.uint64)
    w = rs.randint(0, 4, size=(16, 3)).astype(np.int64)
    enc = gm.encrypt_matrix(pkey, jnp.asarray(x), seed=5)
    res = gm.matrix_multiplication(enc, jnp.asarray(w), pkey)
    assert res.data.dtype == jnp.uint32
    assert int(jnp.max(res.data)) < 2**P.ct_modulus_out_bits


def test_result_under_post_compression_key_only(pkey):
    """Decrypting with the INPUT key must fail -- the packing keyswitch
    really switched keys."""
    rs = np.random.RandomState(1)
    x = rs.randint(0, 4, size=(1, 16)).astype(np.uint64)
    w = rs.randint(1, 4, size=(16, 2)).astype(np.int64)
    enc = gm.encrypt_matrix(pkey, jnp.asarray(x), seed=6)
    res = gm.matrix_multiplication(enc, jnp.asarray(w), pkey)
    import dataclasses

    wrong = dataclasses.replace(pkey, post_key=pkey.glwe_key)
    bad = np.asarray(gm.decrypt_matrix(res, wrong))
    good = np.asarray(gm.decrypt_matrix(res, pkey))
    assert not np.array_equal(bad, good)


def test_prepared_weights_jit_path_matches_legacy(pkey):
    """PreparedClearMatrix enters jit as an argument and must produce
    exactly the same ciphertexts as the eager concrete-weight path."""
    import jax

    rs = np.random.RandomState(5)
    r, c, o = 2, 16, 3
    x = rs.randint(0, 16, size=(r, c)).astype(np.uint64)
    w = rs.randint(-8, 8, size=(c, o)).astype(np.int64)
    enc = gm.encrypt_matrix(pkey, jnp.asarray(x), seed=9)
    res_legacy = gm.matrix_multiplication(enc, jnp.asarray(w), pkey)

    P = pkey.params
    prep = gm.prepare_clear_weights(P, w)
    step = jax.jit(
        lambda e, pw, pk: gm.matrix_multiplication(
            gm.EncryptedMatrix(glwes=e, params=P, n_valid=c, shape=(r, c)),
            pw,
            pk,
        )
    )
    res_prep = step(enc.glwes, prep, pkey)
    np.testing.assert_array_equal(
        np.asarray(res_legacy.data), np.asarray(res_prep.data)
    )
    got = np.asarray(gm.decrypt_matrix(res_prep, pkey))
    np.testing.assert_array_equal(got, x.astype(np.int64) @ w)
