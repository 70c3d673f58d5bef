"""Deterministic randomness for key generation and noise sampling.

All sampling goes through JAX's counter-based threefry PRNG, so every key,
mask and noise sample is reproducible from a single integer seed. This is
the determinism contract the reference tests demand (reference:
ml/extensions/tests/test_random_seed.py) and it is what makes golden test
vectors possible without a CSPRNG side-channel.

Security note: for production deployments the seed must come from an OS
CSPRNG (`secrets`); the framework takes the seed as input and never invents
entropy itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.params import NoiseDistribution

U64 = jnp.uint64


class FheRng:
    """A splittable deterministic RNG handle.

    Thin wrapper over `jax.random` keys with TFHE-specific samplers. Each
    call consumes a fresh subkey, so sampling order is the reproducibility
    contract.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def split(self, n: int = 2):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return [FheRng(k) for k in keys[1:]]

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def fork(self) -> "FheRng":
        return FheRng(self._next())

    # -- samplers ----------------------------------------------------------

    def uniform_torus(self, shape) -> jax.Array:
        """Uniform u64 torus elements (ciphertext masks)."""
        return jax.random.bits(self._next(), shape, dtype=jnp.uint64)

    def binary(self, shape) -> jax.Array:
        """Uniform bits in {0,1} as u64 (binary secret keys)."""
        return jax.random.bits(self._next(), shape, dtype=jnp.uint32).astype(U64) & U64(1)

    def tuniform(self, bound_log2: int, shape) -> jax.Array:
        """TUniform(b) noise as u64 two's complement.

        Distribution over [-2^b, 2^b]: sample r uniform on b+2 bits, output
        ((r + 1) >> 1) - 2^b. Interior values have probability 2^-(b+1),
        the two bounds 2^-(b+2) (tfhe-rs TUniform semantics; the reference's
        default params are the *_TUNIFORM_2M128 family,
        sdk/relayer/src/tfhe.ts:14).
        """
        b = bound_log2
        assert 0 <= b <= 61
        r = jax.random.bits(self._next(), shape, dtype=jnp.uint64)
        r = r >> U64(64 - (b + 2))  # b+2 uniform bits
        v = ((r + U64(1)) >> U64(1)) - U64(2**b)  # wraps: negative as 2^64-x
        return v

    def gaussian_torus(self, std_fraction: float, shape) -> jax.Array:
        """Centered gaussian with std = std_fraction * 2^64, rounded to u64.

        Sampled in float64 (CPU) / float32 (TPU fallback) -- noise does not
        need bit-exactness, only the right distribution.
        """
        g = jax.random.normal(self._next(), shape, dtype=jnp.float64)
        scaled = g * (std_fraction * 2.0**64)
        # round to nearest integer, wrap into u64
        return jnp.round(scaled).astype(jnp.int64).astype(U64)

    def noise(self, dist: NoiseDistribution, shape) -> jax.Array:
        if dist.kind == "zero":
            return jnp.zeros(shape, dtype=U64)
        if dist.kind == "tuniform":
            return self.tuniform(dist.bound_log2, shape)
        if dist.kind == "gaussian":
            return self.gaussian_torus(dist.std, shape)
        raise ValueError(dist.kind)
