"""Shortint: the PBS-refreshed small-integer layer (2-bit msg + 2-bit carry).

This is the block type out of which the fhevm radix integers are built
(reference: ml/extensions/rust/src/radix_utils.rs:21-51 -- FheUint64 is 32
2-bit blocks; the default parameter set is
PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128, sdk/relayer/src/tfhe.ts:14).

Ciphertexts live under the *big* (extracted) key; each programmable
bootstrap keyswitches down to the small key, blind-rotates and extracts
back up (the KS_PBS order of the reference's parameter names). Every
ciphertext tracks a static `degree` (max attainable value), which gates
when bivariate LUTs are legal and when carries must be flushed -- the same
bookkeeping tfhe-rs does, but host-side/static so ops stay jit-friendly.

A "ciphertext" here is a *batch*: `ct` has shape (..., kN+1), and every op
(including the PBS) maps over the leading dims in one device program. The
radix layer exploits this by making the block axis just another batch dim.
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.core.bootstrap import (
    BootstrapKey,
    gen_bootstrap_key,
    programmable_bootstrap,
)
from tfhe_tpu.core.glwe import trivial_glwe
from tfhe_tpu.core.keys import (
    GlweSecretKey,
    LweSecretKey,
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import (
    KeyswitchKey,
    decrypt_lwe,
    encrypt_lwe,
    gen_keyswitch_key,
    keyswitch,
    trivial_lwe,
)
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.ops.folded_ntt import get_folded_engine as get_engine
from tfhe_tpu.params import ShortintParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("params",))
class ClientKey:
    glwe_key: GlweSecretKey
    lwe_key: LweSecretKey  # small key
    params: ShortintParams

    @property
    def big_lwe_key(self) -> LweSecretKey:
        return glwe_to_lwe_secret_key(self.glwe_key)


@pytree_dataclass(meta=("params",))
class ServerKey:
    bsk: BootstrapKey
    ksk: KeyswitchKey
    params: ShortintParams


@pytree_dataclass(meta=("params", "degree", "noise_level"))
class Ciphertext:
    """Batched shortint ciphertext under the big key: ct (..., kN+1)."""

    ct: jax.Array
    params: ShortintParams
    degree: int  # max attainable encoded value (inclusive)
    noise_level: int  # number of fresh-ciphertext noises accumulated

    @property
    def shape(self):
        return self.ct.shape[:-1]


import functools


@functools.lru_cache(maxsize=None)
def _keygen_program(params: ShortintParams, multibit_group: int | None = None):
    """One jitted program for the whole keygen: eager keygen paid the
    ~37 ms dispatch floor per op plus one device compile per engine
    method/shape (PERF_NOTES.md); fused it is a single compile.

    multibit_group=g builds a MULTI-BIT bootstrap key instead of the
    classic one (core/multibit.py; the 1.8x-faster production engine) --
    apply_lut dispatches on the key type, so every shortint/radix op
    rides it transparently."""
    engine = get_engine(params.polynomial_size)

    @jax.jit
    def go(key):
        rng = FheRng(key)
        glwe_sk = gen_glwe_secret_key(
            rng, params.glwe_dimension, params.polynomial_size
        )
        small_sk = gen_lwe_secret_key(rng, params.lwe_dimension)
        big_sk = glwe_to_lwe_secret_key(glwe_sk)
        if multibit_group is None:
            bsk = gen_bootstrap_key(
                small_sk, glwe_sk, params.pbs, rng, params.glwe_noise, engine
            )
        else:
            from tfhe_tpu.core.multibit import gen_multibit_bootstrap_key

            bsk = gen_multibit_bootstrap_key(
                small_sk, glwe_sk, params.pbs, multibit_group, rng,
                params.glwe_noise, engine,
            )
        ksk = gen_keyswitch_key(big_sk, small_sk, params.ks, rng, params.lwe_noise)
        ck = ClientKey(glwe_key=glwe_sk, lwe_key=small_sk, params=params)
        sk = ServerKey(bsk=bsk, ksk=ksk, params=params)
        return ck, sk

    return go


def keygen(
    params: ShortintParams, seed: int = 0, multibit_group: int | None = None
) -> tuple[ClientKey, ServerKey]:
    if multibit_group is None and "MULTI_BIT_GROUP_" in params.name:
        # the multi-bit parameter sets imply their group size
        multibit_group = int(
            params.name.split("MULTI_BIT_GROUP_")[1].split("_")[0]
        )
    return _keygen_program(params, multibit_group)(jax.random.key(seed))


def engine_for(params: ShortintParams) -> NegacyclicEngine:
    return get_engine(params.polynomial_size)


# -- client side --------------------------------------------------------------


def encrypt(ck: ClientKey, values, rng: FheRng) -> Ciphertext:
    """values: (...,) ints in [0, message_modulus) -> batched ciphertext."""
    p = ck.params
    values = jnp.asarray(values, dtype=U64)
    ct = encrypt_lwe(ck.big_lwe_key, encode(values, p.delta), rng, p.glwe_noise)
    return Ciphertext(ct=ct, params=p, degree=p.message_modulus - 1, noise_level=1)


def decrypt(ck: ClientKey, c: Ciphertext) -> jax.Array:
    """Full decode over the whole msg*carry space (matches tfhe-rs decrypt,
    which exposes carries to the caller)."""
    p = ck.params
    space = p.message_modulus * p.carry_modulus
    return decode(decrypt_lwe(ck.big_lwe_key, c.ct), p.delta, space)


def decrypt_message(ck: ClientKey, c: Ciphertext) -> jax.Array:
    return decrypt(ck, c) % U64(ck.params.message_modulus)


def trivial_encrypt(params: ShortintParams, values) -> Ciphertext:
    values = jnp.asarray(values, dtype=U64)
    ct = trivial_lwe(encode(values, params.delta), params.big_lwe_dimension)
    return Ciphertext(
        ct=ct, params=params, degree=params.message_modulus - 1, noise_level=0
    )


# -- lookup tables -------------------------------------------------------------


def generate_lut(params: ShortintParams, f: Union[Callable, np.ndarray]) -> jax.Array:
    """Trivial-GLWE accumulator for the PBS of f over [0, msg*carry).

    Standard construction: each of the p_half = msg*carry plaintext values
    owns a box of N/p_half coefficients holding f(v)*delta; the whole test
    polynomial is rotated by half a box so rounding is centered.
    """
    n = params.polynomial_size
    p_half = params.message_modulus * params.carry_modulus
    box = n // p_half
    assert box >= 1, "polynomial too small for the plaintext space"
    if callable(f):
        table = np.array([int(f(v)) for v in range(p_half)], dtype=np.uint64)
    else:
        table = np.asarray(f, dtype=np.uint64)
        assert table.shape == (p_half,)
    assert int(table.max()) < p_half, "LUT output exceeds plaintext space"
    vals = np.repeat(table * np.uint64(params.delta), box)
    neg_head = (-(vals[: box // 2].astype(np.int64))).astype(np.uint64)
    rot = np.concatenate([vals[box // 2 :], neg_head])
    return trivial_glwe(jnp.asarray(rot), params.glwe_dimension)


def generate_lut_bivariate(params: ShortintParams, f: Callable) -> jax.Array:
    """LUT for f(a, b) evaluated on the packed value a*msg_mod + b."""
    m = params.message_modulus
    p_half = m * params.carry_modulus

    def g(x):
        return f(x // m, x % m)

    table = np.array([int(g(v)) % p_half for v in range(p_half)], dtype=np.uint64)
    return generate_lut(params, table)


# -- server-side operations ----------------------------------------------------


def apply_lut(sk: ServerKey, c: Ciphertext, lut: jax.Array, out_degree: int) -> Ciphertext:
    """The PBS atom: keyswitch down + programmable bootstrap with `lut`.
    Dispatches on the key type: multi-bit keys (keygen(multibit_group=g))
    run the n/g-step aggregated rotation."""
    p = sk.params
    engine = engine_for(p)
    from tfhe_tpu.core.bootstrap import keyswitch_pbs
    from tfhe_tpu.core.multibit import (
        MultiBitBootstrapKey,
        multibit_keyswitch_pbs,
    )

    # fused keyswitch+PBS: one device program per atom instead of two
    # (each eager dispatch costs ~37 ms on the tunneled backend)
    if isinstance(sk.bsk, MultiBitBootstrapKey):
        out = multibit_keyswitch_pbs(c.ct, lut, sk.bsk, sk.ksk, engine)
    else:
        out = keyswitch_pbs(c.ct, lut, sk.bsk, sk.ksk, engine)
    return Ciphertext(ct=out, params=p, degree=out_degree, noise_level=1)


def apply_function(sk: ServerKey, c: Ciphertext, f: Callable) -> Ciphertext:
    p = sk.params
    p_half = p.message_modulus * p.carry_modulus
    _check_degree(c)
    table = [int(f(v)) % p_half for v in range(p_half)]
    out_degree = max(table[: min(c.degree, p_half - 1) + 1])
    return apply_lut(sk, c, generate_lut(p, np.array(table, dtype=np.uint64)), out_degree)


def _check_degree(c: Ciphertext):
    p_half = c.params.message_modulus * c.params.carry_modulus
    assert c.degree < p_half, (
        f"degree {c.degree} overflows the {p_half}-value plaintext space; "
        "propagate carries first"
    )


def add(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Unchecked homomorphic add: degrees accumulate into the carry space."""
    assert a.params == b.params
    return Ciphertext(
        ct=a.ct + b.ct,
        params=a.params,
        degree=a.degree + b.degree,
        noise_level=a.noise_level + b.noise_level,
    )


def scalar_add(a: Ciphertext, s: int) -> Ciphertext:
    p = a.params
    new = a.ct.at[..., -1].add(encode(jnp.asarray(s, dtype=U64), p.delta))
    return Ciphertext(
        ct=new, params=p, degree=a.degree + s, noise_level=a.noise_level
    )


def scalar_mul(a: Ciphertext, s: int) -> Ciphertext:
    assert s >= 0
    return Ciphertext(
        ct=a.ct * U64(s),
        params=a.params,
        degree=a.degree * s,
        noise_level=a.noise_level * s,
    )


def neg(a: Ciphertext) -> Ciphertext:
    """-x as (z*msg_mod - x) with z = ceil((degree+1)/msg_mod): stays
    non-negative, congruent to -x mod msg_mod (the tfhe-rs neg trick)."""
    p = a.params
    m = p.message_modulus
    z = -(-(a.degree + 1) // m)  # ceil
    shift = encode(jnp.asarray(z * m, dtype=U64), p.delta)
    new = (-a.ct).at[..., -1].add(shift)
    return Ciphertext(
        ct=new, params=p, degree=z * m, noise_level=a.noise_level
    )


def sub(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    return add(a, neg(b))


def message_extract(sk: ServerKey, a: Ciphertext) -> Ciphertext:
    """PBS(x mod msg_mod): flush carries, refresh noise."""
    m = sk.params.message_modulus
    return apply_function(sk, a, lambda v: v % m)


def carry_extract(sk: ServerKey, a: Ciphertext) -> Ciphertext:
    """PBS(x // msg_mod): the carry as a fresh block."""
    m = sk.params.message_modulus
    return apply_function(sk, a, lambda v: v // m)


def bivariate_pbs(
    sk: ServerKey, a: Ciphertext, b: Ciphertext, f: Callable
) -> Ciphertext:
    """f(a, b) in one PBS via the packing a*msg_mod + b.

    Requires a.degree < msg_mod and b.degree < msg_mod (fresh blocks).
    """
    p = sk.params
    m = p.message_modulus
    p_half = m * p.carry_modulus
    assert a.degree < m and b.degree < m, (
        f"bivariate PBS needs fresh operands (degrees {a.degree},{b.degree})"
    )
    packed = add(scalar_mul(a, m), b)
    table = [int(f(v // m, v % m)) % p_half for v in range(p_half)]
    out_degree = max(
        table[x * m + y] for x in range(a.degree + 1) for y in range(b.degree + 1)
    )
    return apply_lut(
        sk, packed, generate_lut(p, np.array(table, dtype=np.uint64)), out_degree
    )


def mul(sk: ServerKey, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Block multiply mod the full space via one bivariate PBS."""
    return bivariate_pbs(sk, a, b, lambda x, y: x * y)
