"""LWE layer: encrypt/decrypt, keyswitch, sample extraction.

An LWE ciphertext is a u64 tensor (..., n+1): n mask coefficients followed
by the body. Reference equivalents: tfhe-rs LWE ops consumed at
ml/extensions/rust/src/computations.rs:109-132 (sample extract) and the
keyswitch keys of ml/extensions/rust/src/compression.rs:151-189.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tfhe_tpu.core.keys import LweSecretKey
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import signed_decompose
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


def encrypt_lwe(
    sk: LweSecretKey,
    pt: jax.Array,
    rng: FheRng,
    noise: NoiseDistribution,
) -> jax.Array:
    """pt: (...,) u64 torus values -> ct (..., n+1)."""
    pt = jnp.asarray(pt, dtype=U64)
    batch = pt.shape
    n = sk.n
    mask = rng.uniform_torus(batch + (n,))
    e = rng.noise(noise, batch)
    body = pt + e + jnp.sum(mask * sk.key, axis=-1, dtype=U64)
    return jnp.concatenate([mask, body[..., None]], axis=-1)


def decrypt_lwe(sk: LweSecretKey, ct: jax.Array) -> jax.Array:
    """Phase: body - <mask, s>. Returns (...,) noisy plaintext."""
    mask = ct[..., :-1]
    body = ct[..., -1]
    return body - jnp.sum(mask * sk.key, axis=-1, dtype=U64)


def trivial_lwe(pt: jax.Array, n: int) -> jax.Array:
    pt = jnp.asarray(pt, dtype=U64)
    mask = jnp.zeros(pt.shape + (n,), dtype=U64)
    return jnp.concatenate([mask, pt[..., None]], axis=-1)


def lwe_add(a: jax.Array, b: jax.Array) -> jax.Array:
    return a + b


def lwe_sub(a: jax.Array, b: jax.Array) -> jax.Array:
    return a - b


def lwe_scalar_mul(a: jax.Array, c) -> jax.Array:
    return a * U64(c)


def lwe_add_plain(a: jax.Array, pt) -> jax.Array:
    return a.at[..., -1].add(jnp.asarray(pt, dtype=U64))


def sample_extract(glwe_ct: jax.Array, index: int = 0) -> jax.Array:
    """Extract coefficient `index` of a GLWE ciphertext as an LWE ciphertext
    under the flattened key (keys.glwe_to_lwe_secret_key).

    glwe_ct: (..., k+1, N) -> (..., k*N + 1). The reference extracts the
    last coefficient after its dot products (computations.rs:109-132); blind
    rotation extracts coefficient 0. `index` covers both.

    Extracted mask: for key poly j, a'_{jN+i} = +mask_j[index-i] for
    i <= index, and -mask_j[N+index-i] for i > index (negacyclic phase
    algebra).
    """
    n = glwe_ct.shape[-1]
    k = glwe_ct.shape[-2] - 1
    mask = glwe_ct[..., :-1, :]
    body = glwe_ct[..., -1, index]
    i = jnp.arange(n)
    src = (index - i) % n
    sign_neg = i > index
    extracted = jnp.take(mask, src, axis=-1)
    extracted = jnp.where(sign_neg, (~extracted) + U64(1), extracted)
    flat = extracted.reshape(*glwe_ct.shape[:-2], k * n)
    return jnp.concatenate([flat, body[..., None]], axis=-1)


def sample_extract_all(glwe_ct: jax.Array) -> jax.Array:
    """Extract ALL N coefficients at once: (..., k+1, N) -> (..., N, k*N+1).

    One vectorized gather replaces a Python loop of N eager
    sample_extract calls (the compact-PKE expansion hot path: per-op
    dispatch dominated the /input-proof wall time). Same negacyclic
    phase algebra as sample_extract, with the index axis materialized."""
    n = glwe_ct.shape[-1]
    k = glwe_ct.shape[-2] - 1
    mask = glwe_ct[..., :-1, :]
    body = glwe_ct[..., -1, :]  # (..., N)
    i = jnp.arange(n)
    t = i[:, None]  # extraction index axis
    src = (t - i[None, :]) % n  # (N_t, N_i)
    sign_neg = i[None, :] > t  # (N_t, N_i)
    ext = jnp.take(mask, src.reshape(-1), axis=-1)
    ext = ext.reshape(*mask.shape[:-1], n, n)  # (..., k, N_t, N_i)
    ext = jnp.where(sign_neg, (~ext) + U64(1), ext)
    ext = jnp.moveaxis(ext, -3, -2)  # (..., N_t, k, N_i)
    flat = ext.reshape(*glwe_ct.shape[:-2], n, k * n)
    return jnp.concatenate([flat, body[..., None]], axis=-1)


@pytree_dataclass(meta=("gadget",))
class KeyswitchKey:
    """LWE -> LWE keyswitch key.

    ksk: (n_in, level, n_out+1) u64 -- ksk[i, l] encrypts
    s_in[i] * q / B^(l+1) under s_out.

    ksk_limbs: (16, n_in*level, n_out+1) int8 -- the same key split into
    sixteen 4-bit limbs. The keyswitch contraction then runs as int8
    matmuls with int32 accumulation: TPUs have no 64-bit dot (XLA's X64
    rewriting does not cover dot_general), but the MXU natively does
    int8 x int8 -> int32, which is both the portability fix and the
    speed-of-light path.
    """

    ksk: jax.Array
    ksk_limbs: jax.Array
    gadget: GadgetParams

    @property
    def n_in(self) -> int:
        return self.ksk.shape[0]

    @property
    def n_out(self) -> int:
        return self.ksk.shape[2] - 1


def _u64_to_nibbles(x: jax.Array) -> jax.Array:
    """u64 (..., m) -> int8 (16, ..., m) of 4-bit limbs, LSB first."""
    limbs = []
    for l in range(16):
        limbs.append(((x >> U64(4 * l)) & U64(0xF)).astype(jnp.int8))
    return jnp.stack(limbs, axis=0)


def gen_keyswitch_key(
    sk_in: LweSecretKey,
    sk_out: LweSecretKey,
    gadget: GadgetParams,
    rng: FheRng,
    noise: NoiseDistribution,
) -> KeyswitchKey:
    b, l = gadget.base_log, gadget.level
    assert b <= 7, "digit magnitude must fit int8 for the MXU contraction"
    shifts = jnp.array([64 - (i + 1) * b for i in range(l)], dtype=U64)
    # pt[i, l] = s_in[i] << (64 - (l+1)*b)
    pts = sk_in.key[:, None] << shifts[None, :]
    ksk = encrypt_lwe(sk_out, pts, rng, noise)
    flat = ksk.reshape(sk_in.n * l, -1)
    return KeyswitchKey(ksk=ksk, ksk_limbs=_u64_to_nibbles(flat), gadget=gadget)


@jax.jit
def keyswitch(ct: jax.Array, ksk: KeyswitchKey) -> jax.Array:
    """Switch (..., n_in+1) to (..., n_out+1) under the output key.

    out = (0, body_in) - sum_{i,l} digit_{i,l} * ksk[i,l]  with balanced
    gadget digits of the input mask. The contraction runs as 16 int8
    matmuls (digits x 4-bit key limbs -> int32 partial sums, recombined
    with wrapping shifts): exact mod 2^64 because
    |digit| * 15 * n_in * level < 2^31 for every parameter set, and int8
    is what the MXU natively accelerates (TPUs have no 64-bit dot; XLA's
    X64 rewriting does not cover dot_general).
    """
    mask = ct[..., :-1]
    body = ct[..., -1]
    digits = signed_decompose(mask, ksk.gadget)  # (..., n_in, level)
    flat = digits.reshape(*digits.shape[:-2], -1).astype(jnp.int8)
    acc = None
    for l in range(16):
        part = jnp.matmul(
            flat, ksk.ksk_limbs[l], preferred_element_type=jnp.int32
        )
        term = part.astype(jnp.int64).astype(U64) << U64(4 * l)
        acc = term if acc is None else acc + term
    out = -acc
    return out.at[..., -1].add(body)
