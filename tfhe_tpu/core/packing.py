"""Packing keyswitch: a list of LWE ciphertexts -> one GLWE ciphertext.

LWE ct c lands on coefficient c of the output polynomial. This is the
compression primitive behind the encrypted-matmul result format (reference:
ml/extensions/rust/src/compression.rs:244-291
`par_keyswitch_lwe_ciphertext_list_and_pack_in_glwe_ciphertext` and its CUDA
variant :190-242).

Math: for LWE cts {(a^(c), b^(c))}_c under key s_in and packing key
KSK[i,l] = GLWE_enc_{S_out}(s_in[i] * q/B^(l+1)),

    out = (0, sum_c b_c X^c) - sum_{i,l} D_{i,l}(X) (*) KSK[i,l]

where D_{i,l}(X) = sum_c digit_{c,i,l} X^c gathers the c-th ciphertext's
i-th mask digit on coefficient c. The digit polynomials are small, so the
products ride the exact NTT engine like every other keyswitch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.glwe import encrypt_glwe
from tfhe_tpu.core.keys import GlweSecretKey, LweSecretKey
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import signed_decompose
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("gadget", "shift"))
class PackingKeyswitchKey:
    """ksk_ntt: (n_in, level, k_out+1, n_primes, 2, N) u32 Shoup pairs --
    NTT-domain GLWE encryptions of s_in[i] * q/B^(l+1), stored
    modulus-switched to 64-shift bits (see gen_packing_keyswitch_key)."""

    ksk_ntt: jax.Array
    gadget: GadgetParams
    shift: int = 0

    @property
    def n_in(self) -> int:
        return self.ksk_ntt.shape[0]


def gen_packing_keyswitch_key(
    sk_in: LweSecretKey,
    sk_out: GlweSecretKey,
    gadget: GadgetParams,
    rng: FheRng,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
) -> PackingKeyswitchKey:
    import math

    from tfhe_tpu.torus import mod_switch

    b, l = gadget.base_log, gadget.level
    n_poly = sk_out.n_poly
    shifts = jnp.array([64 - (i + 1) * b for i in range(l)], dtype=U64)
    # plaintext poly for (i, l): constant s_in[i] << shift
    pts = jnp.zeros((sk_in.n, l, n_poly), dtype=U64)
    pts = pts.at[..., 0].set(sk_in.key[:, None] << shifts[None, :])
    ksk = encrypt_glwe(sk_out, pts, rng, noise, engine)  # (n_in, l, k+1, N)
    # CRT-range headroom: packing_keyswitch sums n_in*level digit x key
    # NTT products BEFORE the single inverse transform, so the true
    # integer convolution magnitude gains ceil(log2(n_in*level)) bits on
    # top of the per-product bound max_product_bits already covers. At
    # full-width key storage the Garner reconstruction wraps once enough
    # ciphertexts are packed (seen as garbage outputs for >~96 packed
    # LWEs at N=256) -- store the key modulus-switched like the BSK
    # (bootstrap.py msb pattern) and scale back at the inverse transform.
    headroom = math.ceil(math.log2(sk_in.n * l))
    msb = min(55, engine.max_product_bits - (b - 1) - headroom)
    assert msb > 0, "packing-KS parameters exceed the CRT range"
    f = engine.forward_u64(mod_switch(ksk, msb))
    return PackingKeyswitchKey(
        ksk_ntt=engine.make_shoup(f), gadget=gadget, shift=64 - msb
    )


def packing_keyswitch(
    lwe_cts: jax.Array,
    pksk: PackingKeyswitchKey,
    engine: NegacyclicEngine,
) -> jax.Array:
    """lwe_cts: (..., T, n_in+1) with T <= N -> GLWE (..., k_out+1, N).

    Ciphertext t lands on coefficient t; unused coefficients hold zeros
    (plus keyswitch noise).
    """
    t = lwe_cts.shape[-2]
    n_in = lwe_cts.shape[-1] - 1
    gadget = pksk.gadget
    level = gadget.level
    ntt_shape = pksk.ksk_ntt.shape
    k1 = ntt_shape[2]
    n_poly = ntt_shape[-1]
    assert t <= n_poly

    mask = lwe_cts[..., :-1]  # (..., T, n_in)
    body = lwe_cts[..., -1]  # (..., T)

    digits = signed_decompose(mask, gadget)  # (..., T, n_in, level)
    # digit polynomials: coefficient t of D_{i,l} is digit_{t,i,l}
    digits = jnp.moveaxis(digits, -3, -1)  # (..., n_in, level, T)
    pad = [(0, 0)] * (digits.ndim - 1) + [(0, n_poly - t)]
    digit_polys = jnp.pad(digits, pad)  # (..., n_in, level, N)

    fd = engine.forward_small(digit_polys)  # (..., n_in, level, P, N)
    # contract over (n_in, level) in chunks to bound peak memory (the full
    # outer product is ~GBs at n_in=2048); Shoup products against the key
    # pairs, unreduced u64 accumulation, one reduction at the end
    chunk = 128
    n_in_k = pksk.n_in
    s = None
    for lo in range(0, n_in_k, chunk):
        hi = min(lo + chunk, n_in_k)
        a = fd[..., lo:hi, :, None, :, :]  # (..., c, level, 1, P, N)
        b = pksk.ksk_ntt[lo:hi]  # (c, level, k+1, P, 2, N)
        prod = engine.pointwise_shoup(a, b)  # (..., c, level, k+1, P, N)
        part = jnp.sum(prod.astype(U64), axis=(-5, -4))  # (..., k+1, P, N)
        s = part if s is None else s + part
    f = engine.reduce_u64_domain(s)  # (..., k+1, P, N) u32
    acc = engine.backward(f, shift=pksk.shift)  # (..., k+1, N)
    out_ct = -acc
    # add body polynomial to the GLWE body component
    body_poly = jnp.zeros(body.shape[:-1] + (n_poly,), dtype=U64)
    body_poly = body_poly.at[..., :t].set(body)
    return out_ct.at[..., k1 - 1, :].add(body_poly)
