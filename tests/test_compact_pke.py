"""Compact PKE: dedicated params, shared-mask lists, casting keyswitch
(VERDICT round-1 missing item 6; reference tfhe.ts:17-26,
encrypt.ts:71-150)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.api import compact_pke as cp
from tfhe_tpu.api.public_key import gen_public_key, pk_encrypt_blocks
from tfhe_tpu.core.lwe import decrypt_lwe
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode
from tfhe_tpu.utils import serialization

U64 = jnp.uint64
P = tp.TOY_SHORTINT


@pytest.fixture(scope="module")
def setup():
    ck, sk = si.keygen(P, seed=41)
    keys = cp.gen_compact_pke_keys(ck, cp.TOY_PKE, FheRng(42))
    return ck, sk, keys


def test_encrypt_expand_decrypt(setup):
    ck, _, keys = setup
    vals = np.arange(20) % 4
    lst = cp.compact_pke_encrypt(keys, jnp.asarray(vals, dtype=U64), FheRng(43))
    lwes = cp.expand(keys, lst)
    assert lwes.shape == (20, P.big_lwe_dimension + 1)
    space = P.plaintext_modulus // 2
    got = np.asarray(decode(decrypt_lwe(ck.big_lwe_key, lwes), P.delta, space))
    np.testing.assert_array_equal(got % 4, vals)


def test_multi_list_packing(setup):
    """More values than one polynomial: spills into a second GLWE."""
    ck, _, keys = setup
    n = cp.TOY_PKE.polynomial_size
    vals = (np.arange(n + 7) * 3) % 4
    lst = cp.compact_pke_encrypt(keys, jnp.asarray(vals, dtype=U64), FheRng(44))
    assert lst.glwes.shape[0] == 2
    got = np.asarray(
        decode(
            decrypt_lwe(ck.big_lwe_key, cp.expand(keys, lst)),
            P.delta,
            P.plaintext_modulus // 2,
        )
    )
    np.testing.assert_array_equal(got % 4, vals)


def test_compactness_vs_round1_scheme(setup):
    """The compact list must be much smaller than per-value big-LWE rows
    (the round-1 scheme): >= 8x for a 64-value input at TOY sizes."""
    ck, _, keys = setup
    vals = jnp.asarray(np.zeros(64), dtype=U64)
    lst = cp.compact_pke_encrypt(keys, vals, FheRng(45))
    compact_bytes = lst.glwes.size * 8
    pk = gen_public_key(ck, FheRng(46))
    fat = pk_encrypt_blocks(pk, vals, FheRng(47))
    fat_bytes = fat.size * 8
    assert fat_bytes >= 8 * compact_bytes, (fat_bytes, compact_bytes)


def test_expanded_blocks_are_pbs_compatible(setup):
    """Cast blocks must survive a PBS at the compute params (the whole
    point of casting into the compute set)."""
    ck, sk, keys = setup
    vals = np.asarray([0, 1, 2, 3])
    lst = cp.compact_pke_encrypt(keys, jnp.asarray(vals, dtype=U64), FheRng(48))
    lwes = cp.expand(keys, lst)
    c = si.Ciphertext(ct=lwes, params=P, degree=3, noise_level=1)
    out = si.apply_function(sk, c, lambda v: (v + 2) % 4)
    got = np.asarray(si.decrypt(ck, out))
    np.testing.assert_array_equal(got, (vals + 2) % 4)
