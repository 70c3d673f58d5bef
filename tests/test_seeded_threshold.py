"""Seeded/compressed ciphertexts and threshold decryption."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.api.threshold import (
    combine_partials,
    partial_decrypt,
    share_secret_key,
)
from tfhe_tpu.core import (
    decrypt_glwe,
    encrypt_lwe,
    gen_glwe_secret_key,
    gen_lwe_secret_key,
)
from tfhe_tpu.core.seeded import (
    compress_glwe,
    decompress_glwe,
    encrypt_glwe_seeded,
    expand_seeded_glwe,
)
from tfhe_tpu.ops.folded_ntt import get_folded_engine as get_engine
from tfhe_tpu.params import NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode

P = params.TOY_SHORTINT
U64 = jnp.uint64


def test_seeded_glwe_roundtrip():
    rng = FheRng(101)
    eng = get_engine(P.polynomial_size)
    sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    msgs = jnp.asarray(
        np.random.RandomState(3).randint(0, 16, size=(2, P.polynomial_size))
    ).astype(U64)
    seeded = encrypt_glwe_seeded(sk, encode(msgs, P.delta), 777, P.glwe_noise, eng)
    # seeded storage carries only bodies
    assert seeded.bodies.shape == (2, P.polynomial_size)
    full = expand_seeded_glwe(seeded)
    dec = decode(decrypt_glwe(sk, full, eng), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))
    # expansion is deterministic
    full2 = expand_seeded_glwe(seeded)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(full2))


def test_compress_decompress_glwe():
    rng = FheRng(102)
    eng = get_engine(P.polynomial_size)
    sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    msgs = jnp.asarray(
        np.random.RandomState(4).randint(0, 16, size=(P.polynomial_size,))
    ).astype(U64)
    from tfhe_tpu.core import encrypt_glwe

    ct = encrypt_glwe(sk, encode(msgs, P.delta), rng, P.glwe_noise, eng)
    comp = compress_glwe(ct, 26)
    assert comp.data.dtype == jnp.uint32
    back = decompress_glwe(comp)
    dec = decode(decrypt_glwe(sk, back, eng), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


@pytest.mark.parametrize("n_parties", [2, 5])
def test_threshold_decryption(n_parties):
    rng = FheRng(103)
    sk = gen_lwe_secret_key(rng, 64)
    msgs = jnp.arange(16, dtype=U64)
    ct = encrypt_lwe(sk, encode(msgs, P.delta), rng, NoiseDistribution.tuniform(10))
    shares = share_secret_key(sk, n_parties, rng)
    flood = NoiseDistribution.tuniform(40)
    partials = [
        partial_decrypt(ct, sh, FheRng(200 + i), flood)
        for i, sh in enumerate(shares)
    ]
    out = combine_partials(ct, partials, P.delta, 16)
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))


def test_threshold_single_share_insufficient():
    rng = FheRng(104)
    sk = gen_lwe_secret_key(rng, 64)
    msgs = jnp.arange(16, dtype=U64)
    ct = encrypt_lwe(sk, encode(msgs, P.delta), rng, NoiseDistribution.tuniform(10))
    shares = share_secret_key(sk, 3, rng)
    partials = [partial_decrypt(ct, shares[0], FheRng(300), None)]
    out = np.asarray(combine_partials(ct, partials, P.delta, 16))
    assert (out != np.arange(16)).sum() >= 12  # garbage without all shares
