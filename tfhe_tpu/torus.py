"""Discretized-torus arithmetic on uint64 tensors.

The torus T = R/Z is discretized to q = 2^64 levels; torus elements are
uint64 with natural wraparound, so additions/subtractions/integer scaling
are plain u64 ops. This module provides the three non-trivial primitives:

  * delta encode/decode of small plaintexts (reference:
    ml/extensions/rust/src/encryption.rs:5-40 `encryption_delta` + decode),
  * balanced (signed) gadget decomposition with round-to-closest, matching
    tfhe-rs SignedDecomposer semantics (reference: encryption.rs:152-166),
  * modulus switching q -> 2N for blind rotation and q -> 2^t for
    compression (reference: compression.rs:59-128).

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.params import GadgetParams

U64 = jnp.uint64
Q_BITS = 64


def encode(msg: jax.Array, delta: int) -> jax.Array:
    """msg * delta on the torus (msg may exceed the nominal modulus; wraps)."""
    return jnp.asarray(msg).astype(U64) * U64(delta)


def decode(pt: jax.Array, delta: int, modulus: int) -> jax.Array:
    """Round to the nearest multiple of delta and reduce: the decoder used
    after decryption (noise below delta/2 is absorbed)."""
    rounded = (pt + U64(delta // 2)) // U64(delta)
    return (rounded % U64((2**Q_BITS) // delta)) % U64(modulus)


def decode_signed(pt: jax.Array, delta: int, modulus: int) -> jax.Array:
    """Decode into the centered range [-modulus/2, modulus/2) as int64
    (reference decrypt applies a signed wrap, encryption.rs:185-203)."""
    v = decode(pt, delta, modulus).astype(jnp.int64)
    return v - jnp.where(v >= modulus // 2, jnp.int64(modulus), jnp.int64(0))


def round_to_msb(x: jax.Array, msb: int) -> jax.Array:
    """Round x to the closest multiple of 2^(64-msb); returns the msb-bit
    integer (may wrap to 0 at the top, which is correct mod q)."""
    shift = U64(Q_BITS - msb)
    half = U64(1) << (shift - U64(1)) if msb < Q_BITS else U64(0)
    return (x + half) >> shift


def signed_decompose(x: jax.Array, gadget: GadgetParams) -> jax.Array:
    """Balanced gadget decomposition of u64 torus elements.

    Returns digits stacked along a new trailing axis of size `level`, as
    u64 two's complement of signed values in [-B/2, B/2]. Digit i has
    weight q / B^(i+1) (most-significant first), i.e.

        sum_i digits[..., i] * 2^(64 - (i+1)*base_log)  ==  round(x)   (mod q)

    where round(x) is x rounded to its `level*base_log` most significant
    bits. This is the tfhe-rs SignedDecomposer contract (reference:
    encryption.rs:152-166, used for keyswitch and external products).
    """
    b = gadget.base_log
    l = gadget.level
    base = U64(1) << U64(b)
    half = U64(1) << U64(b - 1)
    state = round_to_msb(x, l * b)  # l*b-bit integer
    digits = []
    # extract from least significant digit (weight q/B^l) upward, carrying
    for _ in range(l):
        d = state & (base - U64(1))
        state = state >> U64(b)
        carry = (d >= half).astype(U64)  # d in [B/2, B-1] -> d - B, carry 1
        d = d - carry * base  # wraps to two's complement of negative digit
        state = state + carry
        digits.append(d)
    digits.reverse()  # most significant (weight q/B) first
    return jnp.stack(digits, axis=-1)


def recompose(digits: jax.Array, gadget: GadgetParams) -> jax.Array:
    """Inverse of signed_decompose up to rounding (tests/diagnostics)."""
    b, l = gadget.base_log, gadget.level
    acc = jnp.zeros(digits.shape[:-1], dtype=U64)
    for i in range(l):
        acc = acc + (digits[..., i] << U64(Q_BITS - (i + 1) * b))
    return acc


def mod_switch(x: jax.Array, log2_target: int) -> jax.Array:
    """Switch x from mod 2^64 to mod 2^log2_target with rounding.

    Used to bring LWE coefficients into the Z_{2N} exponent domain before
    blind rotation, and for compression storage moduli (reference:
    compression.rs:59-128 modulus-switched storage).
    """
    return round_to_msb(x, log2_target) % (U64(1) << U64(log2_target))


def negacyclic_monomial_rotate(poly: jax.Array, r: jax.Array) -> jax.Array:
    """Multiply polynomial(s) by the monomial X^r in Z_q[X]/(X^N + 1).

    poly: (..., N) u64; r: broadcastable to poly.shape[:-1], integer
    exponents taken mod 2N. Implemented as a barrel rotation: log2(2N)
    rounds of fixed power-of-two negacyclic rotations selected by the bits
    of r. Shift+select vectorizes on the VPU where a per-row gather does
    not (measured 30x faster on TPU at blind-rotation shapes).
    """
    n = poly.shape[-1]
    log_2n = (2 * n).bit_length() - 1
    r = jnp.asarray(r).astype(U64)
    batch = jnp.broadcast_shapes(poly.shape[:-1], r.shape)
    x = jnp.broadcast_to(poly, batch + (n,))
    r = jnp.broadcast_to(r, batch)
    for k in range(log_2n):
        amt = 1 << k
        if amt < n:
            # X^{2^k}: coefficients shift up by amt; wrapped tail negates
            rotated = jnp.concatenate(
                [(~x[..., n - amt :]) + U64(1), x[..., : n - amt]], axis=-1
            )
        else:
            rotated = (~x) + U64(1)  # X^N = -1
        bit = ((r >> U64(k)) & U64(1))[..., None].astype(bool)
        x = jnp.where(bit, rotated, x)
    return x
