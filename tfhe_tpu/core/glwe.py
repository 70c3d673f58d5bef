"""GLWE encryption/decryption over q = 2^64.

A GLWE ciphertext is a u64 tensor (..., k+1, N): k mask polynomials followed
by the body. Everything is batched over leading dims.

Semantics mirror the reference's GLWE layer (reference:
ml/extensions/rust/src/encryption.rs:43-133 encrypt, :135-203 decrypt), with
the engine's exact NTT polymul in place of tfhe-rs polynomial arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.keys import GlweSecretKey
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import NoiseDistribution
from tfhe_tpu.rng import FheRng

U64 = jnp.uint64


def mask_times_key(
    mask: jax.Array, sk_ntt: jax.Array, engine: NegacyclicEngine
) -> jax.Array:
    """sum_j mask_j * s_j (negacyclic, mod 2^64).

    mask: (..., k, N) u64; sk_ntt: (k, n_primes, 2, N) Shoup pairs from
    keys.glwe_key_ntt. Returns (..., N).
    """
    k = mask.shape[-2]
    fm = engine.forward_u64(mask)  # (..., k, P, N)
    acc = None
    for j in range(k):
        term = engine.pointwise_shoup(fm[..., j, :, :], sk_ntt[j])
        acc = term if acc is None else engine.add_domain(acc, term)
    return engine.backward(acc)


def encrypt_glwe(
    sk: GlweSecretKey,
    pt: jax.Array,
    rng: FheRng,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
    sk_ntt: jax.Array | None = None,
) -> jax.Array:
    """Encrypt plaintext polynomial(s) pt: (..., N) u64 -> (..., k+1, N)."""
    from tfhe_tpu.core.keys import glwe_key_ntt

    if sk_ntt is None:
        sk_ntt = glwe_key_ntt(sk, engine)
    batch = pt.shape[:-1]
    n = pt.shape[-1]
    mask = rng.uniform_torus(batch + (sk.k, n))
    e = rng.noise(noise, batch + (n,))
    body = pt + e + mask_times_key(mask, sk_ntt, engine)
    return jnp.concatenate([mask, body[..., None, :]], axis=-2)


def decrypt_glwe(
    sk: GlweSecretKey,
    ct: jax.Array,
    engine: NegacyclicEngine,
    sk_ntt: jax.Array | None = None,
) -> jax.Array:
    """Phase: body - sum mask_j * s_j. Returns (..., N) noisy plaintext."""
    from tfhe_tpu.core.keys import glwe_key_ntt

    if sk_ntt is None:
        sk_ntt = glwe_key_ntt(sk, engine)
    mask = ct[..., :-1, :]
    body = ct[..., -1, :]
    return body - mask_times_key(mask, sk_ntt, engine)


def trivial_glwe(pt: jax.Array, k: int) -> jax.Array:
    """Noiseless, keyless encryption (mask = 0): encodes public constants,
    e.g. PBS test vectors. pt: (..., N) -> (..., k+1, N)."""
    batch = pt.shape[:-1]
    n = pt.shape[-1]
    mask = jnp.zeros(batch + (k, n), dtype=U64)
    return jnp.concatenate([mask, pt[..., None, :]], axis=-2)
