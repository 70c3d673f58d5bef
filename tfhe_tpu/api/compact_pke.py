"""Compact public-key encryption with casting keyswitch.

The reference encrypts inputs under DEDICATED compact-PKE parameters and
casts into the compute parameter set server-side (reference:
sdk/relayer/src/tfhe.ts:17-26 V1_0_PARAM_PKE_MESSAGE_2_CARRY_2... +
ShortintKeySwitchingParameters; sdk/encrypt.ts:71-150 packs <= 256
values / <= 2048 bits into one CompactCiphertextList whose values share
mask material). Round 1 pk-encrypted every value as a full big-LWE row
directly under the compute key -- no compactness, large blowup.

Construction here (the GLWE form of compact lists):

- PKE key: a GLWE secret key over dedicated (k_pke, N_pke) params.
- PKE public key: M GLWE zero-encryptions; encrypting a batch of up to
  N_pke block values packs them as COEFFICIENTS of one plaintext
  polynomial and produces ONE GLWE ciphertext:
      ct = sum_i r_i * PK_i + (0, mu(X))
  so N_pke values share k_pke*N_pke mask words -- the compact list.
  Expansion ratio ~ (k_pke+1)/N_pke per value vs (n_compute+1) for the
  round-1 scheme.
- Expansion (server-side): sample-extract each used coefficient into an
  LWE under the flattened PKE key, then CASTING KEYSWITCH into the
  compute key via a standard LWE keyswitch key (the
  ShortintKeySwitchingParameters role).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.core.glwe import encrypt_glwe, trivial_glwe
from tfhe_tpu.core.keys import (
    GlweSecretKey,
    gen_glwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import KeyswitchKey, gen_keyswitch_key, keyswitch, sample_extract
from tfhe_tpu.models.shortint import ClientKey
from tfhe_tpu.ops.folded_ntt import FoldedCrtEngine
from tfhe_tpu.params import GadgetParams, NoiseDistribution, ShortintParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import encode
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@dataclasses.dataclass(frozen=True)
class PkeParams:
    """Dedicated compact-PKE parameter set (the V1_0_PARAM_PKE_* role).
    Values re-derived for this engine; deltas vs tfhe-rs documented in
    params.py's header note."""

    name: str
    glwe_dimension: int
    polynomial_size: int
    noise: NoiseDistribution
    casting_ks: GadgetParams


PKE_PARAMS_2M128 = PkeParams(
    name="V1_PKE_MESSAGE_2_CARRY_2_TUNIFORM_2M128",
    glwe_dimension=1,
    polynomial_size=1024,
    noise=NoiseDistribution.tuniform(42),
    casting_ks=GadgetParams(base_log=3, level=5),
)

TOY_PKE = PkeParams(
    name="TOY_PKE",
    glwe_dimension=1,
    polynomial_size=128,
    noise=NoiseDistribution.tuniform(6),
    casting_ks=GadgetParams(base_log=4, level=3),
)


@pytree_dataclass(meta=("params", "compute_params"))
class CompactPkeKeySet:
    """Server-held: PKE secret key material + the casting key into the
    compute parameter set."""

    pke_pk: jax.Array  # (M, k+1, N) GLWE zero-encryptions
    casting_ksk: KeyswitchKey
    params: PkeParams
    compute_params: ShortintParams


@pytree_dataclass(meta=("params", "n_values"))
class CompactCiphertextList:
    """One GLWE ciphertext per N_pke values (the shared-mask compact
    list); `n_values` coefficients are meaningful."""

    glwes: jax.Array  # (n_lists, k+1, N)
    params: PkeParams
    n_values: int


def _engine(n: int) -> FoldedCrtEngine:
    from tfhe_tpu.models.glwe_matmul import get_engine

    return get_engine(n)


def gen_compact_pke_keys(
    ck: ClientKey, pke: PkeParams, rng: FheRng, n_rows: int | None = None
) -> CompactPkeKeySet:
    """Generate the PKE keypair + casting keyswitch key.

    The PKE secret never leaves this function's return closure -- only
    the public key and the casting KSK (encrypted under the COMPUTE key)
    are needed afterwards, exactly the reference's key-material split."""
    engine = _engine(pke.polynomial_size)
    pke_sk = gen_glwe_secret_key(rng, pke.glwe_dimension, pke.polynomial_size)
    m = n_rows or (pke.glwe_dimension * pke.polynomial_size + 128)
    pk = encrypt_glwe(
        pke_sk,
        jnp.zeros((m, pke.polynomial_size), dtype=U64),
        rng,
        pke.noise,
        engine,
    )
    flat = glwe_to_lwe_secret_key(pke_sk)
    casting = gen_keyswitch_key(
        flat, ck.big_lwe_key, pke.casting_ks, rng, ck.params.glwe_noise
    )
    return CompactPkeKeySet(
        pke_pk=pk, casting_ksk=casting, params=pke, compute_params=ck.params
    )


def compact_pke_encrypt_with_witness(
    keys: CompactPkeKeySet, block_values, rng: FheRng
) -> tuple[CompactCiphertextList, jax.Array, jax.Array]:
    """Like `compact_pke_encrypt`, also returning the encryption witness
    (r, e) the ZK proof of plaintext knowledge needs (api/zkpok.py --
    reference builds the proof inside build_with_proof_packed,
    encrypt.ts:185-189)."""
    pke = keys.params
    n = pke.polynomial_size
    vals = jnp.asarray(block_values, dtype=U64)
    v = vals.shape[0]
    n_lists = -(-v // n)
    padded = jnp.zeros((n_lists * n,), dtype=U64).at[:v].set(vals)
    pt = encode(padded.reshape(n_lists, n), keys.compute_params.delta)
    m = keys.pke_pk.shape[0]
    r = rng.binary((n_lists, m))
    # r . PK (GLWE rows) -- exact u64 wrapping contraction
    ct = jnp.einsum("lm,mkn->lkn", r, keys.pke_pk)
    e = rng.noise(pke.noise, (n_lists, n))
    ct = ct.at[:, -1, :].add(pt + e)
    return CompactCiphertextList(glwes=ct, params=pke, n_values=v), r, e


def compact_pke_encrypt(
    keys: CompactPkeKeySet, block_values, rng: FheRng
) -> CompactCiphertextList:
    """block_values: (V,) shortint block values -> ceil(V / N_pke) GLWEs.

    Client-side: needs only the public key."""
    lst, _, _ = compact_pke_encrypt_with_witness(keys, block_values, rng)
    return lst


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _expand_program(glwes: jax.Array, casting_ksk, n_keep: int) -> jax.Array:
    """ALL coefficient extractions + the casting keyswitch as ONE device
    program (the eager per-coefficient loop paid N dispatch floors and
    dominated /input-proof wall time). Only the first n_keep extracted
    rows enter the keyswitch — a 2-value list must not pay a 2048-row
    keyswitch; n_keep is a power-of-two bucket so distinct value counts
    share compiled programs."""
    from tfhe_tpu.core.lwe import sample_extract_all

    lwes = sample_extract_all(glwes)  # (n_lists, N, n_pke+1)
    flat = lwes.reshape(-1, lwes.shape[-1])[:n_keep]
    return keyswitch(flat, casting_ksk)


def expand(
    keys: CompactPkeKeySet, lst: CompactCiphertextList
) -> jax.Array:
    """Server-side expansion: extract each coefficient as an LWE under
    the flattened PKE key, then casting-keyswitch into the compute key.
    Returns (V, n_compute+1) u64 shortint-encoded LWE blocks."""
    total = lst.glwes.shape[0] * lst.params.polynomial_size
    n_keep = min(total, 1 << max(0, (lst.n_values - 1)).bit_length())
    return _expand_program(lst.glwes, keys.casting_ksk, n_keep)[: lst.n_values]
