"""Programmable bootstrapping: blind rotation over the CMux tree.

The PBS is the framework's unit of work (BASELINE.json north star:
bootstraps/sec per chip). Structure:

  1. modulus-switch the input LWE ciphertext into the Z_2N exponent domain,
  2. blind rotation: acc = X^{-b~} * LUT; then for each secret bit j,
     acc <- CMux(BSK_j, acc, X^{a~_j} * acc)  -- a `lax.scan` over the n
     bootstrap-key GGSWs, batched over arbitrarily many ciphertexts,
  3. sample-extract coefficient 0 into an LWE ciphertext under the big key.

The bootstrap key lives in NTT/limb form in HBM: shape
(n, (k+1)*level, k+1, n_primes, n_limbs, N). Batch parallelism (many
ciphertexts per scan step) is the TPU throughput story; the scan itself is
inherently sequential in n, exactly like the reference's per-bit blind
rotation inside tfhe-rs (SURVEY.md section 2 "native components" item 6).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tfhe_tpu.core.ggsw import encrypt_ggsw_bits, external_product, ggsw_to_ntt
from tfhe_tpu.core.keys import GlweSecretKey, LweSecretKey
from tfhe_tpu.core.lwe import sample_extract
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import mod_switch, negacyclic_monomial_rotate
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("gadget", "shift"))
class BootstrapKey:
    """NTT-domain bootstrap key: (n, D, k+1, n_primes, 2, N) u32 Shoup
    pairs (value, floor(value*2^32/p)).

    The key is modulus-switched to 64-shift bits before the transform so
    gadget digits x key products fit the 3-prime CRT range; `shift` scales
    results back (the added rounding noise is negligible next to the
    external-product noise, see tfhe_tpu.noise).

    `rot_table` is the (2N, P, 2, N) Shoup table of NTT(X^e - 1) rows the
    fused kernel gathers per step. It rides the key pytree so it enters
    every jitted program as an ARGUMENT -- an lru-cached module-level
    table leaks tracers across traces (multi-op workloads crash) and
    would bake 200 MB constants into remote compiles."""

    bsk_ntt: jax.Array
    gadget: GadgetParams
    shift: int
    rot_table: jax.Array | None = None

    @property
    def lwe_dim(self) -> int:
        return self.bsk_ntt.shape[0]

    @property
    def poly_size(self) -> int:
        return self.bsk_ntt.shape[-1]


def gen_bootstrap_key(
    lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    gadget: GadgetParams,
    rng: FheRng,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
) -> BootstrapKey:
    """GGSW-encrypt each bit of the small LWE secret under the GLWE key.

    The NTT-domain key is stored as u32 (all residues are < p < 2^32),
    halving HBM footprint: full fhevm params (n=880, N=2048, l=1) fit in
    ~0.9 GB instead of 1.9 GB. Kernels upcast per blind-rotation step.
    """
    ggsw = encrypt_ggsw_bits(glwe_sk, lwe_sk.key, gadget, rng, noise, engine)
    rot_table = _monomial_rot_rows(engine)
    # Full CRT headroom minus 1 bit for the rotation-free CMux's
    # (X^a - 1) NTT-domain multiply (doubles the reconstructed bound).
    # Round 1 hardcoded 44; the 2^20 key-rounding it left was the
    # DOMINANT phase-noise term (measured ~2^55 vs the 2^54 mod-switch
    # drift floor) -- at base_log 23 / N 2048 the range allows 53.
    msb = min(55, engine.max_product_bits - (gadget.base_log - 1) - 1)
    # max_product_bits already accounts for the N-fold convolution sum
    assert (
        gadget.base_log - 1 + msb + 1 <= engine.max_product_bits
    ), "gadget digits x key values exceed the CRT range"
    bsk_ntt, shift = ggsw_to_ntt(ggsw, engine, msb_bits=msb)
    return BootstrapKey(
        bsk_ntt=bsk_ntt, gadget=gadget, shift=shift, rot_table=rot_table
    )


def _monomial_rot_rows(engine) -> jax.Array:
    """(2N, P, 2, N) Shoup pairs of NTT(X^e - 1), e in [0, 2N). Built
    with plain traced ops so it is safe both eagerly and inside a jitted
    keygen (it returns as a pytree leaf, never a cached tracer)."""
    import numpy as np

    n = engine.n
    polys = np.zeros((2 * n, n), dtype=np.int32)
    for e in range(2 * n):
        if e < n:
            polys[e, e] += 1
        else:
            polys[e, e - n] -= 1
        polys[e, 0] -= 1
    f = engine.forward_small(jnp.asarray(polys))
    return engine.make_shoup(f)


def blind_rotate(
    lut: jax.Array,
    lwe_ct: jax.Array,
    bsk: BootstrapKey,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Rotate the LUT accumulator by the (mod-switched) phase of lwe_ct.

    lut: (k+1, N) or (..., k+1, N) GLWE accumulator (usually trivial);
    lwe_ct: (..., n+1). Returns (..., k+1, N) GLWE whose coefficient 0
    holds LUT[decode(phase)].
    """
    n_poly = bsk.poly_size
    two_n = 2 * n_poly
    log_2n = int(math.log2(two_n))
    ms = mod_switch(lwe_ct, log_2n)  # (..., n+1) values in [0, 2N)
    a_t = ms[..., :-1]
    b_t = ms[..., -1]
    # acc = X^{-b} * LUT  (exponent 2N - b ≡ -b mod 2N)
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (lut.shape[-2], n_poly))

    a_steps = jnp.moveaxis(a_t, -1, 0)  # (n, ...)

    if (
        getattr(engine, "use_pallas", False)
        and bsk.gadget.level == 1
        and bsk.gadget.base_log <= 31
        and lut.shape[-2] == 2  # k + 1
    ):
        return _blind_rotate_fused(acc, a_steps, bsk, engine)

    def step(carry, xs):
        bsk_j, a_j = xs  # (D, k+1, P, N), (...,)
        rot = negacyclic_monomial_rotate(carry, a_j[..., None])
        carry = carry + external_product(
            bsk_j, rot - carry, bsk.gadget, engine, shift=bsk.shift
        )
        return carry, None

    acc, _ = jax.lax.scan(step, acc, (bsk.bsk_ntt, a_steps))
    return acc


def _blind_rotate_fused(acc, a_steps, bsk: BootstrapKey, engine) -> jax.Array:
    """Scan of the fully-fused Pallas step kernel (flagship shape:
    level 1, k=1). acc: (..., 2, N) u64; a_steps: (n, ...)."""
    from tfhe_tpu.ops.pallas_blind_rotate import (
        bsk_to_step_layout,
        monomial_ntt_table,
    )

    rot_table = (
        bsk.rot_table
        if bsk.rot_table is not None
        else monomial_ntt_table(engine)  # legacy deserialized keys
    )

    import os

    batch = acc.shape[:-2]
    n_poly = acc.shape[-1]
    b = 1
    for d in batch:
        b *= d
    # adaptive kernel tile rows (ciphertexts per grid step): 64 measured
    # fastest with the packed stage matmuls (317.5 vs 313.6 PBS/s at
    # tm=32, batch 512; steps=8 exceeds scoped VMEM). Needs the raised
    # vmem limit, which pallas_blind_rotate sets for tm > 16; small
    # batches shrink the tile so padding never dominates
    env_tm = os.environ.get("TFHE_TPU_TM")
    if env_tm:
        tm = int(env_tm)
    else:
        tm = 16
        while tm < 64 and tm < b:
            tm *= 2
    pad = (-b) % tm
    flat = acc.reshape(b, 2, n_poly)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 2, n_poly), dtype=flat.dtype)], axis=0
        )
    lo = (flat & U64(0xFFFFFFFF)).astype(jnp.uint32).reshape(-1, n_poly)
    hi = (flat >> U64(32)).astype(jnp.uint32).reshape(-1, n_poly)
    e = a_steps.reshape(a_steps.shape[0], b).astype(jnp.int32)
    if pad:
        e = jnp.concatenate(
            [e, jnp.zeros((e.shape[0], pad), dtype=jnp.int32)], axis=1
        )
    bv, bs = bsk_to_step_layout(bsk.bsk_ntt)
    n_steps = bv.shape[0]
    # CMux steps per kernel call: 4 is the measured sweet spot within the
    # default 16 MiB scoped-VMEM budget; TFHE_TPU_STEPS overrides for
    # experiments (8 needs the raised vmem limit in pallas_blind_rotate)
    want = int(os.environ.get("TFHE_TPU_STEPS", "4"))
    steps = next((k for k in (want, 4, 2, 1) if k > 0 and n_steps % k == 0))
    step_fn = _fused_step(engine, bsk.gadget.base_log, bsk.shift, tm, steps)
    bp = b + pad
    bv = bv.reshape(n_steps // steps, steps, *bv.shape[1:])
    bs = bs.reshape(n_steps // steps, steps, *bs.shape[1:])
    e = e.reshape(n_steps // steps, steps, bp)

    n_pr = engine.n_primes

    def body(carry, xs):
        clo, chi = carry
        bvj, bsj, ej = xs  # (steps, 4P, N) x2, (steps, B)
        rows = rot_table[ej]  # (steps, B, P, 2, N)
        rv = rows[..., 0, :].reshape(steps, bp * n_pr, n_poly)
        rs = rows[..., 1, :].reshape(steps, bp * n_pr, n_poly)
        clo, chi = step_fn(clo, chi, rv, rs, bvj, bsj)
        return (clo, chi), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), (bv, bs, e))
    out = lo.astype(U64) | (hi.astype(U64) << U64(32))
    out = out.reshape(-1, 2, n_poly)[:b]
    return out.reshape(*batch, 2, n_poly)


@functools.lru_cache(maxsize=None)
def _fused_step(engine, base_log: int, shift: int, tm: int, steps: int = 1):
    from tfhe_tpu.ops.pallas_blind_rotate import make_pallas_blind_rotate

    return make_pallas_blind_rotate(
        engine, base_log, shift, tm=tm, steps=steps
    )


@functools.partial(jax.jit, static_argnames=("engine",))
def programmable_bootstrap(
    lwe_ct: jax.Array,
    lut: jax.Array,
    bsk: BootstrapKey,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Full PBS: blind rotate + sample extract. (..., n+1) -> (..., kN+1)
    under the big (extracted) key, refreshed noise, LUT applied.

    jit-compiled once per (shape, params) combination: the batched PBS is
    the framework's unit program, reused across every shortint/radix op.
    """
    acc = blind_rotate(lut, lwe_ct, bsk, engine)
    return sample_extract(acc, 0)


@functools.partial(jax.jit, static_argnames=("engine",))
def keyswitch_pbs(
    big_lwe_ct: jax.Array,
    lut: jax.Array,
    bsk: BootstrapKey,
    ksk,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Keyswitch-down + PBS as ONE device program.

    Eager callers (apply_lut per radix block, the bench loop) otherwise
    pay two ~37 ms dispatch floors per batch on the tunneled backend
    (PERF_NOTES.md); fusing the pair removes one and lets XLA overlap
    the keyswitch matmuls with the first rotation step's prologue."""
    from tfhe_tpu.core.lwe import keyswitch

    return programmable_bootstrap(keyswitch(big_lwe_ct, ksk), lut, bsk, engine)
