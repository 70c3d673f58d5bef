"""Multi-bit PBS: n/g-step blind rotation with aggregated pattern-GGSWs
(the tfhe-rs multi-bit bootstrap the reference's GPU coprocessor uses).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.core.bootstrap import gen_bootstrap_key, programmable_bootstrap
from tfhe_tpu.core.keys import gen_glwe_secret_key, gen_lwe_secret_key, glwe_to_lwe_secret_key
from tfhe_tpu.core.lwe import decrypt_lwe
from tfhe_tpu.core.multibit import (
    gen_multibit_bootstrap_key,
    group_exponents,
    multibit_programmable_bootstrap,
)
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode

U64 = jnp.uint64
P = tp.TOY_SHORTINT


def _setup(seed=11):
    rng = FheRng(seed)
    engine = si.engine_for(P)
    lwe_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    return rng, engine, lwe_sk, glwe_sk


def test_group_exponents():
    a = jnp.asarray(np.arange(8), dtype=U64)  # n=8
    e = np.asarray(group_exponents(a, 2, 256))  # (4 groups, 4 patterns)
    # pattern v bits: v=1 -> bit0, v=2 -> bit1, v=3 -> both
    assert e.shape == (4, 4)
    np.testing.assert_array_equal(e[:, 0], 0)
    np.testing.assert_array_equal(e[:, 1], [0, 2, 4, 6])
    np.testing.assert_array_equal(e[:, 2], [1, 3, 5, 7])
    np.testing.assert_array_equal(e[:, 3], [1, 5, 9, 13])


@pytest.mark.parametrize("g", [2, 4])
def test_multibit_pbs_matches_lut(g):
    rng, engine, lwe_sk, glwe_sk = _setup()
    bsk = gen_multibit_bootstrap_key(
        lwe_sk, glwe_sk, P.pbs, g, rng.fork(), P.glwe_noise, engine
    )
    # f(v) = (3v + 1) mod 4 over the 16-value space
    table = np.asarray([(3 * v + 1) % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P, table)
    msgs = jnp.arange(16, dtype=U64) % U64(16)
    from tfhe_tpu.core.lwe import encrypt_lwe
    from tfhe_tpu.torus import encode

    ct = encrypt_lwe(lwe_sk, encode(msgs, P.delta), rng.fork(), P.lwe_noise)
    out = multibit_programmable_bootstrap(ct, lut, bsk, engine)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    got = np.asarray(decode(decrypt_lwe(big_sk, out), P.delta, 16))
    want = table[np.asarray(msgs)]
    np.testing.assert_array_equal(got % 4, want % 4)


def test_multibit_matches_classic_pbs():
    """Same input, same LUT: multi-bit and classic PBS must decrypt to
    the same plaintext."""
    rng, engine, lwe_sk, glwe_sk = _setup(seed=23)
    classic = gen_bootstrap_key(
        lwe_sk, glwe_sk, P.pbs, rng.fork(), P.glwe_noise, engine
    )
    mb = gen_multibit_bootstrap_key(
        lwe_sk, glwe_sk, P.pbs, 2, rng.fork(), P.glwe_noise, engine
    )
    table = np.asarray([v % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P, table)
    msgs = jnp.asarray([0, 3, 7, 11, 15], dtype=U64)
    from tfhe_tpu.core.lwe import encrypt_lwe
    from tfhe_tpu.torus import encode

    ct = encrypt_lwe(lwe_sk, encode(msgs, P.delta), rng.fork(), P.lwe_noise)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    a = np.asarray(
        decode(
            decrypt_lwe(big_sk, programmable_bootstrap(ct, lut, classic, engine)),
            P.delta, 16,
        )
    )
    b = np.asarray(
        decode(
            decrypt_lwe(big_sk, multibit_programmable_bootstrap(ct, lut, mb, engine)),
            P.delta, 16,
        )
    )
    np.testing.assert_array_equal(a, b)


def test_radix_ops_over_multibit_key():
    """The whole shortint/radix layer rides a multi-bit server key
    transparently (keygen(multibit_group=g) + key-type dispatch in
    apply_lut / integer._pbs)."""
    import dataclasses

    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.params import GadgetParams

    P2 = dataclasses.replace(
        tp.TOY_SHORTINT_CORPUS, name="TOY_MB_RADIX",
        pbs=GadgetParams(base_log=23, level=1),
    )
    ck, sk = si.keygen(P2, seed=3, multibit_group=2)
    from tfhe_tpu.core.multibit import MultiBitBootstrapKey

    assert isinstance(sk.bsk, MultiBitBootstrapKey)
    a = ri.encrypt_radix(ck, jnp.asarray([177, 23], dtype=U64), 8, FheRng(5))
    b = ri.encrypt_radix(ck, jnp.asarray([99, 201], dtype=U64), 8, FheRng(6))
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.add(sk, a, b))), [20, 224]
    )
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.mul(sk, a, b))), [115, 15]
    )
    np.testing.assert_array_equal(
        np.asarray(si.decrypt(ck, ri.lt(sk, a, b))) & 1, [0, 1]
    )


def test_group4_radix_add_matches_clear():
    """GROUP_4 (this framework's extension past tfhe-rs' GROUP_2/3):
    the whole radix layer over a group-4 multi-bit key."""
    import dataclasses

    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.params import GadgetParams

    P4 = dataclasses.replace(
        tp.TOY_SHORTINT_CORPUS, name="TOY_MB_RADIX_G4",
        pbs=GadgetParams(base_log=23, level=1),
    )
    ck, sk = si.keygen(P4, seed=4, multibit_group=4)
    from tfhe_tpu.core.multibit import MultiBitBootstrapKey

    assert isinstance(sk.bsk, MultiBitBootstrapKey)
    assert sk.bsk.group_size == 4
    a = ri.encrypt_radix(ck, jnp.asarray([177, 23], dtype=U64), 8, FheRng(5))
    b = ri.encrypt_radix(ck, jnp.asarray([99, 201], dtype=U64), 8, FheRng(6))
    np.testing.assert_array_equal(
        np.asarray(ri.decrypt_radix(ck, ri.add(sk, a, b))), [20, 224]
    )
