"""4-prime CRT engine (FOLDED_PRIMES_4): exactness + fused-kernel parity.

The 4x ~2^24 prime set trades one extra Garner limb for 3-digit-plane
transforms (ops/folded_ntt.py docstring). These tests pin:
  * engine-level polymul exactness mod 2^64 vs Python ints,
  * Shoup key path equivalence,
  * the generic Garner inside the fused Pallas kernels (interpret mode)
    bit-identical to the XLA scan at 4 primes,
  * full PBS decrypt correctness at 4 primes.
Everything constructs engines EXPLICITLY (primes as a constructor arg,
never via the TFHE_TPU_PRIMES env switch).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.core import bootstrap as bt
from tfhe_tpu.core.keys import (
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe, sample_extract
from tfhe_tpu.models import shortint as si
from tfhe_tpu.ops.folded_ntt import (
    FOLDED_PRIMES,
    FOLDED_PRIMES_4,
    FoldedNtt,
    get_folded_engine,
)
from tfhe_tpu.ops.polynomial import negacyclic_polymul_reference
from tfhe_tpu.params import GadgetParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode, mod_switch, negacyclic_monomial_rotate

U64 = jnp.uint64

PRIME_SETS = [FOLDED_PRIMES, FOLDED_PRIMES_4]
PRIME_IDS = ["3p", "4p"]


def test_prime_set_is_valid():
    """Ascending, prime, 2^13 | p-1, three-digit-plane eligible."""
    from tfhe_tpu.ops.polynomial import _is_prime

    assert tuple(FOLDED_PRIMES_4) == tuple(sorted(FOLDED_PRIMES_4))
    for p in FOLDED_PRIMES_4:
        assert _is_prime(p)
        assert (p - 1) % (1 << 13) == 0
        assert p <= 16580352  # na=3: centered residues fit 3 digits
    prod = 1
    for p in FOLDED_PRIMES_4:
        prod *= p
    assert prod > 2**95  # CRT range beats the 3-prime set's 2^88.2


@pytest.mark.parametrize("p", list(FOLDED_PRIMES_4))
def test_roundtrip_single_prime_4p(p):
    ntt = FoldedNtt(p, 256)
    assert ntt.na == 3
    rng = np.random.default_rng(0)
    x = rng.integers(0, p, size=(3, 256), dtype=np.uint64).astype(np.int64)
    f = ntt.forward_signed(jnp.asarray(x, dtype=jnp.int32))
    back = np.asarray(ntt.inverse(f))
    np.testing.assert_array_equal(back, x.astype(np.uint32))


@pytest.mark.parametrize("primes", PRIME_SETS, ids=PRIME_IDS)
@pytest.mark.parametrize("n", [64, 256])
def test_polymul_mod_2_64(n, primes):
    eng = get_folded_engine(n, primes)
    rng = np.random.default_rng(2)
    a = rng.integers(-(2**9), 2**9, size=(n,))
    b = rng.integers(0, 2**64, size=(n,), dtype=np.uint64)
    out = np.asarray(eng.polymul(jnp.asarray(a), jnp.asarray(b)))
    ref = negacyclic_polymul_reference(a, b, q=2**64)
    np.testing.assert_array_equal(
        out, np.array([int(v) for v in ref], dtype=np.uint64)
    )


def test_shoup_key_path_4p():
    n = 256
    eng = get_folded_engine(n, FOLDED_PRIMES_4)
    rng = np.random.default_rng(4)
    a = rng.integers(-(2**10), 2**10, size=(3, n))
    b = rng.integers(0, 2**64, size=(n,), dtype=np.uint64)
    fa = eng.forward_small(jnp.asarray(a))
    fb = eng.forward_u64(jnp.asarray(b))
    key = eng.make_shoup(fb)
    out_shoup = eng.backward(eng.pointwise_shoup(fa, key))
    out_generic = eng.backward(eng.pointwise_mul(fa, fb))
    np.testing.assert_array_equal(np.asarray(out_shoup), np.asarray(out_generic))


def test_backward_shift_4p():
    n = 64
    eng = get_folded_engine(n, FOLDED_PRIMES_4)
    rng = np.random.default_rng(5)
    a = rng.integers(-(2**10), 2**10, size=(n,))
    b = rng.integers(0, 2**44, size=(n,), dtype=np.uint64)
    f = eng.pointwise_mul(eng.forward_small(jnp.asarray(a)), eng.forward_u64(jnp.asarray(b)))
    out = np.asarray(eng.backward(f, shift=20))
    ref = negacyclic_polymul_reference(a, b, q=2**64)
    want = np.array([int(x) << 20 & (2**64 - 1) for x in ref], dtype=np.uint64)
    np.testing.assert_array_equal(out, want)


def test_max_product_bits_improves():
    e3 = get_folded_engine(2048, FOLDED_PRIMES)
    e4 = get_folded_engine(2048, FOLDED_PRIMES_4)
    assert e4.max_product_bits > e3.max_product_bits


# -- fused kernels at 4 primes (interpret mode on CPU) -----------------------

P_L1 = dataclasses.replace(
    tp.TOY_SHORTINT_NOISELESS,
    name="TOY_SHORTINT_L1_4P",
    pbs=GadgetParams(base_log=23, level=1),
)


@pytest.mark.parametrize("primes", PRIME_SETS, ids=PRIME_IDS)
def test_fused_blind_rotate_4p_decrypts(primes):
    """Classic fused kernel (generic Garner) vs XLA scan at both prime
    sets: bit-identical GLWE and correct decrypt."""
    engine = get_folded_engine(P_L1.polynomial_size, primes)
    rng = FheRng(7)
    lwe_sk = gen_lwe_secret_key(rng, P_L1.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(
        rng, P_L1.glwe_dimension, P_L1.polynomial_size
    )
    bsk = bt.gen_bootstrap_key(
        lwe_sk, glwe_sk, P_L1.pbs, rng.fork(), P_L1.glwe_noise, engine
    )
    table = np.asarray([(3 * v + 1) % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P_L1, table)
    msgs = jnp.asarray(np.arange(5) % 4, dtype=U64)
    ct = encrypt_lwe(lwe_sk, encode(msgs, P_L1.delta), rng.fork(), P_L1.lwe_noise)

    want = bt.blind_rotate(lut, ct, bsk, engine)  # XLA scan (CPU)

    import math

    two_n = 2 * P_L1.polynomial_size
    ms = mod_switch(ct, int(math.log2(two_n)))
    a_t, b_t = ms[..., :-1], ms[..., -1]
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (2, P_L1.polynomial_size))
    a_steps = jnp.moveaxis(a_t, -1, 0)
    got = bt._blind_rotate_fused(acc, a_steps, bsk, engine)

    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    d_want = decrypt_lwe(big_sk, sample_extract(want, 0))
    d_got = decrypt_lwe(big_sk, sample_extract(got, 0))
    space = P_L1.message_modulus * P_L1.carry_modulus * 2
    delta = (1 << 64) // space
    np.testing.assert_array_equal(
        np.asarray(decode(d_want, delta, space)),
        np.asarray(decode(d_got, delta, space)),
    )
    np.testing.assert_array_equal(
        np.asarray(decode(d_got, P_L1.delta, 16)) % 4, table[np.asarray(msgs)] % 4
    )


def test_fused_multibit_4p_bit_identical():
    """Multi-bit fused group-step at 4 primes == XLA path, bit-exact."""
    from tfhe_tpu.core.multibit import (
        gen_multibit_bootstrap_key,
        group_exponents,
        monomial_x_table,
        multibit_blind_rotate,
    )
    from tfhe_tpu.ops.pallas_multibit import multibit_rotate_fused

    g = 2
    engine = get_folded_engine(P_L1.polynomial_size, FOLDED_PRIMES_4)
    rng = FheRng(51)
    lwe_sk = gen_lwe_secret_key(rng, P_L1.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(rng, P_L1.glwe_dimension, P_L1.polynomial_size)
    bsk = gen_multibit_bootstrap_key(
        lwe_sk, glwe_sk, P_L1.pbs, g, rng.fork(), P_L1.glwe_noise, engine
    )
    table = np.asarray([(v * 5 + 2) % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P_L1, table)
    msgs = jnp.asarray(np.arange(9) % 4, dtype=U64)
    ct = encrypt_lwe(lwe_sk, encode(msgs, P_L1.delta), rng.fork(), P_L1.lwe_noise)

    want_glwe = multibit_blind_rotate(lut, ct, bsk, engine)

    n_poly = bsk.poly_size
    two_n = 2 * n_poly
    import math

    ms = mod_switch(ct, int(math.log2(two_n)))
    a_t, b_t = ms[..., :-1], ms[..., -1]
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (lut.shape[-2], n_poly))
    e_all = group_exponents(a_t, g, two_n)
    got_glwe = multibit_rotate_fused(
        acc, e_all, bsk, engine, monomial_x_table(engine)
    )
    np.testing.assert_array_equal(np.asarray(got_glwe), np.asarray(want_glwe))

    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    dec = np.asarray(
        decode(decrypt_lwe(big_sk, sample_extract(got_glwe, 0)), P_L1.delta, 16)
    ) % 4
    np.testing.assert_array_equal(dec, table[np.asarray(msgs)] % 4)
