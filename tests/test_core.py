"""Core crypto layer: GLWE/LWE/GGSW round-trips, keyswitch, CMux, PBS."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.core import (
    blind_rotate,
    cmux,
    decrypt_glwe,
    decrypt_lwe,
    encrypt_ggsw_bits,
    encrypt_glwe,
    encrypt_lwe,
    external_product,
    gen_bootstrap_key,
    gen_glwe_secret_key,
    gen_keyswitch_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
    keyswitch,
    programmable_bootstrap,
    sample_extract,
    trivial_glwe,
)
from tfhe_tpu.core.ggsw import ggsw_to_ntt
from tfhe_tpu.ops.folded_ntt import get_folded_engine as get_engine
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode

U64 = jnp.uint64
P = params.TOY_SHORTINT


def _glwe_setup(noise=None):
    rng = FheRng(123)
    eng = get_engine(P.polynomial_size)
    sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    return rng, eng, sk


def test_glwe_encrypt_decrypt_roundtrip():
    rng, eng, sk = _glwe_setup()
    msgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 16, size=(3, P.polynomial_size))
    ).astype(U64)
    pt = encode(msgs, P.delta)
    ct = encrypt_glwe(sk, pt, rng, P.glwe_noise, eng)
    assert ct.shape == (3, P.glwe_dimension + 1, P.polynomial_size)
    dec = decode(decrypt_glwe(sk, ct, eng), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))


def test_lwe_encrypt_decrypt_roundtrip():
    rng = FheRng(5)
    sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    msgs = jnp.arange(16, dtype=U64)
    ct = encrypt_lwe(sk, encode(msgs, P.delta), rng, P.lwe_noise)
    dec = decode(decrypt_lwe(sk, ct), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.arange(16))


def test_lwe_homomorphic_add():
    rng = FheRng(6)
    sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    a = encrypt_lwe(sk, encode(jnp.asarray([1, 2], dtype=U64), P.delta), rng, P.lwe_noise)
    b = encrypt_lwe(sk, encode(jnp.asarray([2, 5], dtype=U64), P.delta), rng, P.lwe_noise)
    dec = decode(decrypt_lwe(sk, a + b), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), [3, 7])


def test_sample_extract():
    rng, eng, sk = _glwe_setup()
    msgs = jnp.asarray(
        np.random.RandomState(1).randint(0, 16, size=(P.polynomial_size,))
    ).astype(U64)
    ct = encrypt_glwe(sk, encode(msgs, P.delta), rng, P.glwe_noise, eng)
    lwe_sk = glwe_to_lwe_secret_key(sk)
    for idx in [0, 1, P.polynomial_size - 1]:
        lwe_ct = sample_extract(ct, idx)
        dec = decode(decrypt_lwe(lwe_sk, lwe_ct), P.delta, 16)
        assert int(dec) == int(msgs[idx]), f"idx={idx}"


def test_keyswitch():
    rng = FheRng(7)
    eng = get_engine(P.polynomial_size)
    glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    small_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    ksk = gen_keyswitch_key(big_sk, small_sk, P.ks, rng, P.lwe_noise)
    msgs = jnp.arange(16, dtype=U64)
    ct = encrypt_lwe(big_sk, encode(msgs, P.delta), rng, P.glwe_noise)
    ct_small = keyswitch(ct, ksk)
    assert ct_small.shape == (16, P.lwe_dimension + 1)
    dec = decode(decrypt_lwe(small_sk, ct_small), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.arange(16))


def test_external_product():
    rng, eng, sk = _glwe_setup()
    msgs = jnp.asarray(
        np.random.RandomState(2).randint(0, 4, size=(P.polynomial_size,))
    ).astype(U64)
    glwe = encrypt_glwe(sk, encode(msgs, P.delta), rng, P.glwe_noise, eng)
    for bit in [0, 1]:
        ggsw = encrypt_ggsw_bits(
            sk, jnp.asarray(bit, dtype=U64), P.pbs, rng, P.glwe_noise, eng
        )
        res = external_product(ggsw_to_ntt(ggsw, eng), glwe, P.pbs, eng)
        dec = decode(decrypt_glwe(sk, res, eng), P.delta, 16)
        np.testing.assert_array_equal(
            np.asarray(dec), np.asarray(msgs) * bit, err_msg=f"bit={bit}"
        )


def test_cmux():
    rng, eng, sk = _glwe_setup()
    m0 = jnp.zeros((P.polynomial_size,), dtype=U64) + U64(3)
    m1 = jnp.zeros((P.polynomial_size,), dtype=U64) + U64(9)
    ct0 = encrypt_glwe(sk, encode(m0, P.delta), rng, P.glwe_noise, eng)
    ct1 = encrypt_glwe(sk, encode(m1, P.delta), rng, P.glwe_noise, eng)
    for bit, expect in [(0, 3), (1, 9)]:
        ggsw = ggsw_to_ntt(
            encrypt_ggsw_bits(sk, jnp.asarray(bit, dtype=U64), P.pbs, rng, P.glwe_noise, eng),
            eng,
        )
        out = cmux(ggsw, ct0, ct1, P.pbs, eng)
        dec = decode(decrypt_glwe(sk, out, eng), P.delta, 16)
        assert int(dec[0]) == expect


def _pbs_setup(seed=11):
    rng = FheRng(seed)
    eng = get_engine(P.polynomial_size)
    glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    small_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    bsk = gen_bootstrap_key(small_sk, glwe_sk, P.pbs, rng, P.glwe_noise, eng)
    return rng, eng, glwe_sk, small_sk, big_sk, bsk


def _identity_lut():
    """Test polynomial for the identity function over the 16-value space."""
    n = P.polynomial_size
    p_half = P.plaintext_modulus // 2  # 16 usable values under padding
    box = n // p_half
    vals = np.repeat(np.arange(p_half, dtype=np.uint64), box) * np.uint64(P.delta)
    # rotate left by box/2 with negacyclic wrap to center boxes on codes
    neg = (-(vals[: box // 2].astype(np.int64))).astype(np.uint64)
    rot = np.concatenate([vals[box // 2 :], neg])
    return trivial_glwe(jnp.asarray(rot.astype(np.uint64)), P.glwe_dimension)


def test_programmable_bootstrap_identity():
    rng, eng, glwe_sk, small_sk, big_sk, bsk = _pbs_setup()
    lut = _identity_lut()
    msgs = jnp.arange(16, dtype=U64)
    ct = encrypt_lwe(small_sk, encode(msgs, P.delta), rng, P.lwe_noise)
    out = programmable_bootstrap(ct, lut, bsk, eng)
    assert out.shape == (16, P.glwe_dimension * P.polynomial_size + 1)
    dec = decode(decrypt_lwe(big_sk, out), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.arange(16))


def test_full_pbs_loop_with_keyswitch():
    """big-key ct -> keyswitch down -> PBS -> big-key ct (the KS_PBS atom)."""
    rng, eng, glwe_sk, small_sk, big_sk, bsk = _pbs_setup(seed=13)
    ksk = gen_keyswitch_key(big_sk, small_sk, P.ks, rng, P.lwe_noise)
    lut = _identity_lut()
    msgs = jnp.arange(16, dtype=U64)
    ct_big = encrypt_lwe(big_sk, encode(msgs, P.delta), rng, P.glwe_noise)
    ct_small = keyswitch(ct_big, ksk)
    out = programmable_bootstrap(ct_small, lut, bsk, eng)
    dec = decode(decrypt_lwe(big_sk, out), P.delta, 16)
    np.testing.assert_array_equal(np.asarray(dec), np.arange(16))
