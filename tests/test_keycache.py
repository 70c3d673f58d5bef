"""Warm-start key cache: round-trip correctness + cache-hit path."""

import numpy as np

from tfhe_tpu import params as tp
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.utils import keycache


def test_load_or_keygen_roundtrip(tmp_path):
    P = tp.TOY_SHORTINT
    ck, sk, info = keycache.load_or_keygen(P, seed=5, cache_dir=str(tmp_path))
    assert info["hit"] is False and info["seconds"] > 0

    ck2, sk2, info2 = keycache.load_or_keygen(P, seed=5, cache_dir=str(tmp_path))
    assert info2["hit"] is True

    # the reloaded keys must DECRYPT what the fresh keys encrypted and
    # drive a real PBS: full crypto-object fidelity, not just array equality
    vals = np.arange(4, dtype=np.uint64) % 4
    ct = si.encrypt(ck, vals, FheRng(3))
    dec = si.decrypt_message(ck2, ct)
    np.testing.assert_array_equal(np.asarray(dec), vals)

    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64) % 4)
    out = si.apply_lut(sk2, ct, lut, out_degree=3)
    np.testing.assert_array_equal(
        np.asarray(si.decrypt_message(ck, out)), vals
    )


def test_cache_keyed_by_seed_and_params(tmp_path):
    P = tp.TOY_SHORTINT
    a = keycache.cache_path(P, 1, None, str(tmp_path))
    b = keycache.cache_path(P, 2, None, str(tmp_path))
    c = keycache.cache_path(P, 1, 3, str(tmp_path))
    assert len({a, b, c}) == 3
