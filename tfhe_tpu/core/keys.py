"""Secret keys.

Binary secrets throughout (the reference's parameter families use binary
GLWE/LWE secrets; reference: tfhe-rs core_crypto consumed at
ml/extensions/rust/src/fhext_classes.rs:114-151 `create_private_key_internal`).

Keys are NamedTuples of jnp arrays, so they are pytrees: they can be donated
to jit, sharded with jax.sharding, and serialized with the framework's
serialization module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.rng import FheRng

U64 = jnp.uint64


class GlweSecretKey(NamedTuple):
    """Binary GLWE secret: (k, N) u64 in {0,1}."""

    key: jax.Array

    @property
    def k(self) -> int:
        return self.key.shape[0]

    @property
    def n_poly(self) -> int:
        return self.key.shape[1]


class LweSecretKey(NamedTuple):
    """Binary LWE secret: (n,) u64 in {0,1}."""

    key: jax.Array

    @property
    def n(self) -> int:
        return self.key.shape[0]


def gen_glwe_secret_key(rng: FheRng, k: int, n_poly: int) -> GlweSecretKey:
    return GlweSecretKey(key=rng.binary((k, n_poly)))


def gen_lwe_secret_key(rng: FheRng, n: int) -> LweSecretKey:
    return LweSecretKey(key=rng.binary((n,)))


def glwe_to_lwe_secret_key(sk: GlweSecretKey) -> LweSecretKey:
    """The LWE key under which sample-extracted ciphertexts decrypt:
    concatenation of the GLWE key polynomials' coefficients."""
    return LweSecretKey(key=sk.key.reshape(-1))


def glwe_key_ntt(sk: GlweSecretKey, engine: NegacyclicEngine) -> jax.Array:
    """Precomputed NTT-domain secret with Shoup companions
    (k, n_primes, 2, N): the secret is a fixed operand, so every
    mask-times-key product runs as a u32 Shoup sequence."""
    return engine.make_shoup(engine.forward_small(sk.key))
