"""GGSW ciphertexts, external product and CMux.

A GGSW ciphertext encrypting a small integer m is (k+1)*level GLWE rows:
row (j, l) is a zero-encryption plus m * q/B^(l+1) on the constant
coefficient of component j (the gadget matrix). The external product
GGSW(m) x GLWE(pt) -> GLWE(m * pt) is the engine of CMux and blind rotation.

The reference consumes these primitives from inside tfhe-rs (GGSW/CMux power
the PBS behind every fhevm integer op; SURVEY.md section 2 "native
components" item 6). Here they are batched jnp programs over the exact NTT
engine, with GGSW keys held in NTT/limb form so the per-op work is
decompose -> forward NTT -> pointwise MAC -> inverse NTT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.glwe import encrypt_glwe
from tfhe_tpu.core.keys import GlweSecretKey
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import signed_decompose

U64 = jnp.uint64


def encrypt_ggsw_bits(
    sk: GlweSecretKey,
    m: jax.Array,
    gadget: GadgetParams,
    rng: FheRng,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Encrypt small integers m: (...,) -> GGSW (..., (k+1)*level, k+1, N).

    Named `_bits` because the dominant use is bootstrap keys (m = secret key
    bits), but any small integer works.
    """
    m = jnp.asarray(m, dtype=U64)
    k1 = sk.k + 1
    n = sk.n_poly
    level = gadget.level
    d_rows = k1 * level
    zeros = jnp.zeros(m.shape + (d_rows, n), dtype=U64)
    rows = encrypt_glwe(sk, zeros, rng, noise, engine)  # (..., D, k+1, N)
    # gadget: row (j*level + l) adds m * 2^(64-(l+1)*B) to component j coeff 0
    shifts = jnp.array(
        [64 - (l + 1) * gadget.base_log for l in range(level)], dtype=U64
    )
    gvals = m[..., None] << shifts  # (..., level)
    j_idx = jnp.arange(d_rows) // level  # component index per row
    l_idx = jnp.arange(d_rows) % level
    onehot = (
        j_idx[:, None] == jnp.arange(k1)[None, :]
    ).astype(U64)  # (D, k+1)
    add = (
        gvals[..., l_idx][..., None] * onehot
    )  # (..., D, k+1)
    return rows.at[..., 0].add(add)


def ggsw_to_ntt(
    ggsw: jax.Array, engine: NegacyclicEngine, msb_bits: int | None = None
) -> tuple[jax.Array, int] | jax.Array:
    """(..., D, k+1, N) -> (..., D, k+1, n_primes, 2, N) u32 Shoup pairs.

    GGSW keys are fixed operands, so the NTT residues are stored together
    with their Shoup companions (folded_ntt.make_shoup): the per-step
    pointwise products then run as ~20-op u32 sequences instead of
    emulated u64 mulmods. With msb_bits set, the key is modulus-switched
    to that many bits before the transform (CRT headroom for large gadget
    digits; negligible noise, see tfhe_tpu.noise); the caller must then
    pass shift = 64 - msb_bits to external_product.
    """
    if msb_bits is None:
        return engine.make_shoup(engine.forward_u64(ggsw))
    from tfhe_tpu.torus import mod_switch

    f = engine.forward_u64(mod_switch(ggsw, msb_bits))
    return engine.make_shoup(f), 64 - msb_bits


def external_product(
    ggsw_ntt: jax.Array,
    glwe: jax.Array,
    gadget: GadgetParams,
    engine: NegacyclicEngine,
    shift: int = 0,
) -> jax.Array:
    """GGSW(m) x GLWE(pt) -> GLWE(m*pt).

    ggsw_ntt: (..., D, k+1, P, N) (from ggsw_to_ntt), glwe: (..., k+1, N).
    Decomposition digits are forward-transformed once and contracted against
    all (k+1) output components in the NTT domain -- one inverse transform
    per output component/prime, not per row. `shift` matches the key's
    modulus-switched storage (ggsw_to_ntt msb_bits).
    """
    fd = decompose_forward(glwe, gadget, engine)  # (..., D, P, N)
    res = contract_residues(ggsw_ntt, fd, engine)
    return finalize_residues(res, engine, shift=shift)


def decompose_forward(
    glwe: jax.Array, gadget: GadgetParams, engine: NegacyclicEngine
) -> jax.Array:
    """Gadget-decompose a GLWE ct and forward-transform the digit rows:
    (..., k+1, N) -> (..., D, P, N) with D = (k+1)*level."""
    k1 = glwe.shape[-2]
    n = glwe.shape[-1]
    d_rows = k1 * gadget.level
    digits = signed_decompose(glwe, gadget)  # (..., k+1, N, level)
    digits = jnp.moveaxis(digits, -1, -2)  # (..., k+1, level, N)
    digits = digits.reshape(*glwe.shape[:-2], d_rows, n)
    return engine.forward_small(digits)


def contract_residues(
    ggsw_ntt: jax.Array, fd: jax.Array, engine: NegacyclicEngine
) -> jax.Array:
    """Transform-domain MAC over the D rows: Shoup products against the
    key pairs, summed in unreduced u64 and reduced back to canonical
    residues [0, p) per prime. Returns (..., k+1, P, N) u32.

    Canonical output keeps `psum` partial sums from D-sharded keys (the
    GGSW-row / TP sharding of the distributed PBS) inside u32 for up to
    4 model shards; `finalize_residues` absorbs the lazy excess."""
    # fd: (..., D, P, N) u32; ggsw_ntt: (..., D, k+1, P, 2, N)
    prod = engine.pointwise_shoup(
        fd[..., :, None, :, :], ggsw_ntt
    )  # (..., D, k+1, P, N) in [0, 2p)
    s = jnp.sum(prod.astype(U64), axis=-4)  # (..., k+1, P, N)
    return engine.reduce_u64_domain(s, canonical=True)


def finalize_residues(
    res: jax.Array, engine: NegacyclicEngine, shift: int = 0
) -> jax.Array:
    """Inverse-transform contracted residues: (..., k+1, P, N) u32 (lazy,
    up to [0, 4p) after cross-device psum) -> (..., k+1, N) u64. `shift`
    undoes modulus-switched key storage (the BSK is stored at 44 bits)."""
    return engine.backward(engine.condsub_domain(res), shift=shift)


def cmux(
    ggsw_ntt: jax.Array,
    ct_false: jax.Array,
    ct_true: jax.Array,
    gadget: GadgetParams,
    engine: NegacyclicEngine,
    shift: int = 0,
) -> jax.Array:
    """Select ct_true where GGSW encrypts 1, ct_false where 0:
    ct_false + GGSW ⊡ (ct_true - ct_false)."""
    return ct_false + external_product(
        ggsw_ntt, ct_true - ct_false, gadget, engine, shift=shift
    )
