"""Compact public-key encryption.

Role of the reference's TfheCompactPublicKey / CompactCiphertextList
(reference: sdk/relayer/src/tfhe.ts createTfhePublicKey,
sdk/encrypt.ts:54-196 packing <=256 values / <=2048 bits into one list):
clients encrypt inputs WITHOUT the secret key.

Construction: the classic LWE public key -- M zero-encryptions under the
big key; encrypt(mu) = r . PK + (0, ..., 0, mu + e) with fresh binary r per
value. Batched: a whole input list encrypts as one (values, M) x (M, n+1)
u64 contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.lwe import encrypt_lwe
from tfhe_tpu.models.shortint import ClientKey
from tfhe_tpu.params import ShortintParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import encode
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("params",))
class CompactPublicKey:
    zeros: jax.Array  # (M, big_n+1) zero-encryptions under the big key
    params: ShortintParams


def gen_public_key(
    ck: ClientKey, rng: FheRng, n_rows: int | None = None
) -> CompactPublicKey:
    p = ck.params
    if n_rows is None:
        n_rows = p.big_lwe_dimension + 128
    zeros = encrypt_lwe(
        ck.big_lwe_key,
        jnp.zeros((n_rows,), dtype=U64),
        rng,
        p.glwe_noise,
    )
    return CompactPublicKey(zeros=zeros, params=p)


def pk_encrypt_blocks(
    pk: CompactPublicKey, block_values: jax.Array, rng: FheRng
) -> jax.Array:
    """block_values: (...,) plaintext block values (already < msg_mod) ->
    LWE cts (..., big_n+1) encoded at the shortint delta."""
    p = pk.params
    m = pk.zeros.shape[0]
    vals = jnp.asarray(block_values, dtype=U64)
    r = rng.binary(vals.shape + (m,))
    # r . PK as 16 int8 nibble matmuls with i32 accumulation (TPUs have no
    # 64-bit dot; binary r x 4-bit limbs sums to < 2^16 -- exact), the
    # same contraction scheme as core.lwe.keyswitch
    from tfhe_tpu.core.lwe import _u64_to_nibbles

    limbs = _u64_to_nibbles(pk.zeros)  # (16, M, n+1) int8
    r8 = r.astype(jnp.int8)
    ct = None
    for l in range(16):
        part = jnp.matmul(r8, limbs[l], preferred_element_type=jnp.int32)
        term = part.astype(jnp.uint32).astype(U64) << U64(4 * l)
        ct = term if ct is None else ct + term
    e = rng.noise(p.glwe_noise, vals.shape)
    return ct.at[..., -1].add(encode(vals, p.delta) + e)
