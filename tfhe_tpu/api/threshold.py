"""Threshold decryption: multi-party key shares and share recombination.

Analog of the reference's threshold-KMS decryption path (reference:
sdk/relayer/src/relayer/userDecrypt.ts:209-246 -- n KMS parties each
partially decrypt and the client recombines shares via the TKMS WASM
client; local-dev/docker-compose.yml runs `-parties 5`). LWE decryption is
linear in the secret, so an additive n-of-n sharing gives an exact
protocol: party i holds s_i with sum_i s_i = s (mod q) and publishes
partial_i = <a, s_i> + e_flood_i; the combiner computes
b - sum_i partial_i and decodes.

Noise flooding: each party adds fresh TUniform noise so its partial leaks
nothing about s_i beyond the final plaintext (the standard smudging
argument). Shares and partials are batched tensors like everything else;
computing partials for thousands of ciphertexts is one program per party
(the "shares computed batch-parallel on TPU" row of SURVEY.md section 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.keys import LweSecretKey
from tfhe_tpu.params import NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("party", "n_parties"))
class KeyShare:
    share: jax.Array  # (n,) u64 additive share of the secret key
    party: int
    n_parties: int


def share_secret_key(
    sk: LweSecretKey, n_parties: int, rng: FheRng
) -> list[KeyShare]:
    """Split s into n additive shares over Z_q (u64 wraparound)."""
    shares = [rng.uniform_torus((sk.n,)) for _ in range(n_parties - 1)]
    last = sk.key - sum(shares) if shares else sk.key
    shares.append(last)
    return [
        KeyShare(share=s, party=i, n_parties=n_parties)
        for i, s in enumerate(shares)
    ]


def partial_decrypt(
    ct: jax.Array,
    share: KeyShare,
    rng: FheRng,
    flood: NoiseDistribution | None = None,
) -> jax.Array:
    """Party-side: <mask, s_i> + flooding noise. ct: (..., n+1) -> (...,)."""
    mask = ct[..., :-1]
    partial = jnp.sum(mask * share.share, axis=-1, dtype=U64)
    if flood is not None:
        partial = partial + rng.noise(flood, partial.shape)
    return partial


def combine_partials(
    ct: jax.Array, partials: list[jax.Array], delta: int, modulus: int
) -> jax.Array:
    """Combiner-side: b - sum partials, then decode."""
    body = ct[..., -1]
    acc = body
    for p in partials:
        acc = acc - p
    return decode(acc, delta, modulus)
