"""Regression: packing keyswitch at high packed-LWE counts.

The PKSK used to be stored at the full 64-bit modulus; summing
n_in*level digit x key NTT products before the single inverse transform
then exceeded the 3-prime CRT range once ~96+ LWEs were packed at N=256
(Garner wrapped -> garbage decrypts in every wide-output matmul, i.e.
every tree ensemble). The key is now modulus-switched with explicit
summation headroom (core/packing.py gen_packing_keyswitch_key)."""

import numpy as np
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor
from tfhe_tpu.models import glwe_matmul as gm


@pytest.mark.parametrize("o", [96, 200, 256])
def test_wide_output_matmul_exact(o):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, 10))
    w = np.zeros((10, o))
    w[rng.integers(0, 10, o), np.arange(o)] = 1.0  # selector columns
    ex = GlweLinearLayerExecutor(
        weights=w, bias=None, n_bits_in=6, n_bits_w=2,
        exact_int_weights=True, params=tp.TOY_MATMUL,
    ).keygen(0)
    dis = ex.forward(x, fhe="disable")
    enc = ex.forward(x, fhe="execute")
    step = float(ex.last_input_quantizer.scale)
    assert np.abs(enc - dis).max() < 0.5 * step, (
        np.abs(enc - dis).max() / step
    )


def test_full_polynomial_packing_roundtrip():
    """Pack a FULL polynomial's worth of LWEs (t = N): the worst-case
    convolution magnitude the headroom computation must cover."""
    P = tp.TOY_MATMUL
    n = P.polynomial_size
    pk = gm.create_private_key(P, seed=3)
    vals = np.arange(n, dtype=np.uint64) % 7
    enc = gm.encrypt_matrix(pk, vals[None, :] * 0 + vals[None, :], seed=2)
    # identity weights: out column j = input j
    eye = np.eye(n, dtype=np.int64)
    res = gm.matrix_multiplication(enc, eye, pk)
    dec = np.asarray(gm.decrypt_matrix(res, pk))[0]
    np.testing.assert_array_equal(dec.astype(np.uint64), vals)
