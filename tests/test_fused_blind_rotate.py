"""Fused Pallas blind-rotation step vs the XLA scan.

The fused kernel uses the rotation-free CMux form
acc += (X^a - 1) * EP(acc), which is homomorphically equivalent to the
XLA scan's rotate-then-EP form but rounds the decomposition on acc
instead of the rotated difference -- ciphertexts differ by noise terms,
so equality is checked at the decryption level (phases within noise,
identical decoded plaintexts). Runs in Pallas interpret mode on CPU.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.core import bootstrap as bt
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng


@pytest.fixture(scope="module")
def setup():
    # smallest shape the fused kernel covers: N=256 (R=128), k=1, level=1
    P = dataclasses.replace(
        tp.TOY_SHORTINT,
        name="FUSED_TEST",
        lwe_dimension=12,
        glwe_dimension=1,
        polynomial_size=256,
        pbs=tp.GadgetParams(base_log=23, level=1),
    )
    ck, sk = si.keygen(P, seed=2)
    return P, ck, sk


def test_fused_matches_xla_scan(setup):
    P, ck, sk = setup
    engine = si.engine_for(P)
    rng = FheRng(4)
    batch = 5  # not a tile multiple: exercises padding
    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct_big = si.encrypt(ck, vals, rng).ct
    from tfhe_tpu.core.lwe import keyswitch

    small = keyswitch(ct_big, sk.ksk)
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    legacy = bt.blind_rotate(lut, small, sk.bsk, engine)

    # force the fused path (interpret mode on CPU)
    import math

    from tfhe_tpu.torus import mod_switch, negacyclic_monomial_rotate

    two_n = 2 * P.polynomial_size
    ms = mod_switch(small, int(math.log2(two_n)))
    a_t, b_t = ms[..., :-1], ms[..., -1]
    acc = negacyclic_monomial_rotate(
        lut, (jnp.uint64(two_n) - b_t)[..., None]
    )
    acc = jnp.broadcast_to(acc, b_t.shape + (2, P.polynomial_size))
    a_steps = jnp.moveaxis(a_t, -1, 0)
    fused = bt._blind_rotate_fused(acc, a_steps, sk.bsk, engine)

    # equivalent up to noise: sample-extract + decrypt must agree exactly
    from tfhe_tpu.core.lwe import decrypt_lwe, sample_extract
    from tfhe_tpu.torus import decode

    for res in (legacy, fused):
        assert res.shape == acc.shape
    d_leg = decrypt_lwe(ck.big_lwe_key, sample_extract(legacy, 0))
    d_fus = decrypt_lwe(ck.big_lwe_key, sample_extract(fused, 0))
    space = P.message_modulus * P.carry_modulus * 2
    delta = (1 << 64) // space
    np.testing.assert_array_equal(
        np.asarray(decode(d_leg, delta, space)),
        np.asarray(decode(d_fus, delta, space)),
    )
    # and the raw phases differ only by noise far below half a bin
    diff = (np.asarray(d_leg) - np.asarray(d_fus)).astype(np.int64)
    assert np.abs(diff).max() < delta // 8


def test_fused_full_pbs_decrypts(setup):
    """End-to-end PBS through the fused path decrypts correctly."""
    P, ck, sk = setup
    engine = si.engine_for(P)
    engine_use = engine.use_pallas
    try:
        engine.use_pallas = True  # interpret-mode kernels on CPU
        rng = FheRng(6)
        vals = jnp.asarray([0, 1, 2, 3, 1, 2, 0, 3], dtype=jnp.uint64)
        ct = si.encrypt(ck, vals, rng)
        lut = si.generate_lut(P, np.asarray([(3 * v) % 4 for v in range(16)], dtype=np.uint64))
        from tfhe_tpu.core.lwe import keyswitch

        out = bt.programmable_bootstrap(
            keyswitch(ct.ct, sk.ksk), lut, sk.bsk, engine
        )
        dec = si.decrypt(ck, si.Ciphertext(ct=out, params=P, degree=3, noise_level=1))
        np.testing.assert_array_equal(
            np.asarray(dec), (3 * np.asarray(vals)) % 4
        )
    finally:
        engine.use_pallas = engine_use
