"""Seeded and modulus-switched (compressed) ciphertext storage.

Reference equivalents: seeded GLWE encryption (reference:
ml/extensions/rust/src/encryption.rs:43-133 `encrypt_slice_as_seeded_glwe`)
and `CompressedModulusSwitchedSeededGlweCiphertext` (compression.rs:36-129,
SeededCompressedEncryptedVector ml.rs:124-206): the mask of a ciphertext is
pseudorandom, so storing the PRNG seed instead of k*N u64 coefficients
shrinks a GLWE ciphertext by ~(k+1)x, and switching the body to a narrow
storage modulus shrinks the rest.

Determinism contract: masks regenerate from (seed, shape) through the same
threefry sampler used at encryption -- tested byte-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.glwe import mask_times_key
from tfhe_tpu.core.keys import GlweSecretKey, glwe_key_ntt
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import mod_switch
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("seed", "k"))
class SeededGlweCiphertext:
    """bodies: (..., N) u64; masks regenerate from `seed`."""

    bodies: jax.Array
    seed: int
    k: int


def encrypt_glwe_seeded(
    sk: GlweSecretKey,
    pt: jax.Array,
    seed: int,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
) -> SeededGlweCiphertext:
    """Encrypt (..., N) plaintext polys storing only bodies + seed."""
    mask_rng = FheRng(seed)
    noise_rng = FheRng(seed ^ 0x5EEDED)
    batch = pt.shape[:-1]
    n = pt.shape[-1]
    mask = mask_rng.uniform_torus(batch + (sk.k, n))
    e = noise_rng.noise(noise, batch + (n,))
    sk_ntt = glwe_key_ntt(sk, engine)
    body = pt + e + mask_times_key(mask, sk_ntt, engine)
    return SeededGlweCiphertext(bodies=body, seed=seed, k=sk.k)


def expand_seeded_glwe(ct: SeededGlweCiphertext) -> jax.Array:
    """Regenerate masks -> standard GLWE tensor (..., k+1, N)."""
    mask_rng = FheRng(ct.seed)
    batch = ct.bodies.shape[:-1]
    n = ct.bodies.shape[-1]
    mask = mask_rng.uniform_torus(batch + (ct.k, n))
    return jnp.concatenate([mask, ct.bodies[..., None, :]], axis=-2)


@pytree_dataclass(meta=("log2_modulus",))
class CompressedGlweCiphertext:
    """Modulus-switched storage: u32 payload at 2^log2_modulus."""

    data: jax.Array
    log2_modulus: int


def compress_glwe(ct: jax.Array, log2_modulus: int) -> CompressedGlweCiphertext:
    assert log2_modulus <= 32
    return CompressedGlweCiphertext(
        data=mod_switch(ct, log2_modulus).astype(jnp.uint32),
        log2_modulus=log2_modulus,
    )


def decompress_glwe(c: CompressedGlweCiphertext) -> jax.Array:
    """Back to q = 2^64 (the rounding error is absorbed as extra noise)."""
    return c.data.astype(U64) << U64(64 - c.log2_modulus)


def pack_compressed_glwe(c: CompressedGlweCiphertext) -> bytes:
    """Dense bit-packed wire format: log2_modulus bits per coefficient
    (the reference's CompressedModulusSwitchedGlweCiphertext bit-packs
    its PackedIntegers the same way, compression.rs:59-128). Uses the
    native C codec (tfhe_tpu/native)."""
    import numpy as np

    from tfhe_tpu import native

    data = np.asarray(c.data)
    header = (
        bytes([c.log2_modulus, data.ndim])
        + b"".join(int(d).to_bytes(4, "little") for d in data.shape)
    )
    return header + native.bitpack(data, c.log2_modulus)


def unpack_compressed_glwe(blob: bytes) -> CompressedGlweCiphertext:
    import numpy as np

    from tfhe_tpu import native

    log2_m, ndim = blob[0], blob[1]
    shape = tuple(
        int.from_bytes(blob[2 + 4 * i : 6 + 4 * i], "little")
        for i in range(ndim)
    )
    count = int(np.prod(shape))
    vals = native.bitunpack(blob[2 + 4 * ndim :], log2_m, count)
    return CompressedGlweCiphertext(
        data=jnp.asarray(vals.reshape(shape)), log2_modulus=log2_m
    )
