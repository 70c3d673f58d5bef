"""Fused multi-bit group-step kernel vs the XLA reference path:
bit-identical (interpret mode on CPU; the same kernel compiles for TPU).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.core.keys import (
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe, sample_extract
from tfhe_tpu.core.multibit import (
    gen_multibit_bootstrap_key,
    group_exponents,
    multibit_blind_rotate,
)
from tfhe_tpu.models import shortint as si
from tfhe_tpu.ops.pallas_multibit import multibit_rotate_fused
from tfhe_tpu.params import GadgetParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode, mod_switch, negacyclic_monomial_rotate

U64 = jnp.uint64

# level-1 TOY variant: the fused kernel covers the flagship gadget shape
P = dataclasses.replace(
    tp.TOY_SHORTINT_NOISELESS,
    name="TOY_SHORTINT_L1",
    pbs=GadgetParams(base_log=23, level=1),
)


@pytest.mark.parametrize("g", [2, 4])
def test_fused_matches_xla_bit_identical(g):
    rng = FheRng(51)
    engine = si.engine_for(P)
    lwe_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
    bsk = gen_multibit_bootstrap_key(
        lwe_sk, glwe_sk, P.pbs, g, rng.fork(), P.glwe_noise, engine
    )
    table = np.asarray([(v * 5 + 2) % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P, table)
    msgs = jnp.asarray(np.arange(17) % 16, dtype=U64)  # odd batch: pad path
    ct = encrypt_lwe(lwe_sk, encode(msgs, P.delta), rng.fork(), P.lwe_noise)

    # XLA reference (use_pallas is False on CPU, so this is the scan path)
    want_glwe = multibit_blind_rotate(lut, ct, bsk, engine)

    # fused kernel, interpret mode
    n_poly = bsk.poly_size
    two_n = 2 * n_poly
    import math

    ms = mod_switch(ct, int(math.log2(two_n)))
    a_t = ms[..., :-1]
    b_t = ms[..., -1]
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (lut.shape[-2], n_poly))
    e_all = group_exponents(a_t, g, two_n)
    from tfhe_tpu.core.multibit import monomial_x_table
    got_glwe = multibit_rotate_fused(acc, e_all, bsk, engine, monomial_x_table(engine))

    np.testing.assert_array_equal(np.asarray(got_glwe), np.asarray(want_glwe))

    # and the result decrypts to the LUT outputs
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    out = sample_extract(got_glwe, 0)
    dec = np.asarray(decode(decrypt_lwe(big_sk, out), P.delta, 16)) % 4
    np.testing.assert_array_equal(dec, table[np.asarray(msgs)] % 4)
