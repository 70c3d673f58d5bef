"""Multi-bit programmable bootstrapping: g secret bits per blind-rotation
step.

The reference's coprocessor GPU backend bootstraps with tfhe-rs
multi-bit keys (tfhe-rs `multi_bit_programmable_bootstrap`; the CUDA
path the reference consumes via `ml/extensions` pins that engine). The
classic blind rotation is a length-n chain of CMux steps -- the
sequential bottleneck of the whole framework. Grouping g bits cuts the
chain to n/g steps:

    X^{sum_i a_i s_i} = sum_{v in {0,1}^g} [s_grp == v] * X^{<a, v>}

so the key stores, per group j, GGSW encryptions of the 2^g PATTERN
INDICATORS [s_grp == v] (exactly one is 1), and each step aggregates

    GGSW_agg = sum_v NTT(X^{e_v}) . BSK_{j,v},   e_v = <a_grp, v> mod 2N

with pointwise NTT-domain monomial products (cheap) before ONE external
product replaces the accumulator: acc <- EP(GGSW_agg, acc). Transforms
-- the measured 80% of the step (scripts/profile_step_breakdown.py) --
are paid once per GROUP instead of once per bit.

Noise: the aggregation sums 2^g GGSW noise terms (monomial
multiplication preserves magnitude), so the external-product noise grows
by at most 2^g vs classic -- absorbed by the same parameter sets'
margins (tfhe-rs publishes dedicated MULTI_BIT_GROUP_2/3 sets with the
same message/carry layout; tfhe_tpu/params.py defines the analogs).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.core.ggsw import (
    decompose_forward,
    encrypt_ggsw_bits,
    finalize_residues,
    ggsw_to_ntt,
)
from tfhe_tpu.core.keys import GlweSecretKey, LweSecretKey
from tfhe_tpu.core.lwe import sample_extract
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.params import GadgetParams, NoiseDistribution
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import mod_switch, negacyclic_monomial_rotate
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("gadget", "shift", "group_size"))
class MultiBitBootstrapKey:
    """(n_groups, 2^g, D, k+1, P, 2, N) u32 Shoup pairs: GGSW(indicator)
    per (group, bit pattern). `rot_table` = NTT(X^e) Shoup rows, riding
    the key pytree for the same jit-argument discipline as
    BootstrapKey.rot_table."""

    bsk_ntt: jax.Array
    gadget: GadgetParams
    shift: int
    group_size: int
    rot_table: jax.Array | None = None

    @property
    def n_groups(self) -> int:
        return self.bsk_ntt.shape[0]

    @property
    def lwe_dim(self) -> int:
        return self.n_groups * self.group_size

    @property
    def poly_size(self) -> int:
        return self.bsk_ntt.shape[-1]


def gen_multibit_bootstrap_key(
    lwe_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    gadget: GadgetParams,
    group_size: int,
    rng: FheRng,
    noise: NoiseDistribution,
    engine: NegacyclicEngine,
) -> MultiBitBootstrapKey:
    g = group_size
    n = lwe_sk.n
    assert n % g == 0, f"lwe dimension {n} not divisible by group size {g}"
    n_groups = n // g
    v_count = 1 << g
    grp = lwe_sk.key.reshape(n_groups, g)
    patterns = jnp.asarray(
        [[(v >> i) & 1 for i in range(g)] for v in range(v_count)],
        dtype=U64,
    )  # (V, g)
    ind = jnp.all(grp[:, None, :] == patterns[None], axis=-1).astype(U64)
    ggsw = encrypt_ggsw_bits(
        glwe_sk, ind.reshape(-1), gadget, rng, noise, engine
    )  # (G*V, D, k+1, N)
    # store the key at the full CRT headroom MINUS the aggregation bits:
    # the reconstructed integer is a sum of 2^g monomial-rotated
    # convolutions, so the per-term bound must shrink by g bits or rare
    # coefficient sums wrap the CRT range (measured as sporadic 2^60+
    # phase errors). Classic hardcodes 44; at base_log 23 / N 2048 / g=3
    # this gives 51 -- the key-rounding noise term drops 2^7, leaving
    # the standard input mod-switch drift dominant (like classic).
    msb = min(55, engine.max_product_bits - (gadget.base_log - 1) - group_size)
    assert gadget.base_log - 1 + msb + group_size <= engine.max_product_bits
    bsk_ntt, shift = ggsw_to_ntt(ggsw, engine, msb_bits=msb)
    bsk_ntt = bsk_ntt.reshape(n_groups, v_count, *bsk_ntt.shape[1:])
    return MultiBitBootstrapKey(
        bsk_ntt=bsk_ntt, gadget=gadget, shift=shift, group_size=g,
        rot_table=_monomial_x_rows(engine),
    )


def _monomial_x_rows(engine) -> jax.Array:
    """(2N, P, 2, N) Shoup pairs of NTT(X^e): plain traced ops, safe
    eagerly and inside a jitted keygen (returned as a pytree leaf)."""
    n = engine.n
    polys = np.zeros((2 * n, n), dtype=np.int32)
    for e in range(2 * n):
        if e < n:
            polys[e, e] = 1
        else:
            polys[e, e - n] = -1
    f = engine.forward_small(jnp.asarray(polys))
    return engine.make_shoup(f)


@functools.lru_cache(maxsize=None)
def monomial_x_table(engine: NegacyclicEngine):
    """(2N, P, 2, N) u32 Shoup pairs of NTT(X^e), e in [0, 2N)
    (X^{N+j} = -X^j). The multi-bit analog of
    pallas_blind_rotate.monomial_ntt_table, without the -1 term."""
    n = engine.n
    polys = np.zeros((2 * n, n), dtype=np.int32)
    for e in range(2 * n):
        if e < n:
            polys[e, e] = 1
        else:
            polys[e, e - n] = -1
    # The cached table is a device array passed into jitted programs as
    # an ARGUMENT -- never a captured constant (200 MB constants blow
    # the remote compile payload). ensure_compile_time_eval keeps the
    # cached value CONCRETE even if the first call happens under an
    # outer jit trace (a cached tracer would poison every later program).
    with jax.ensure_compile_time_eval():
        f = engine.forward_small(jnp.asarray(polys))
        return engine.make_shoup(f)


def group_exponents(a_t: jax.Array, group_size: int, two_n: int) -> jax.Array:
    """Mod-switched mask exponents (..., n) -> per-group subset sums
    (n_groups, 2^g, ...): e[j, v] = sum_{i in v} a[g*j + i] mod 2N."""
    g = group_size
    v_count = 1 << g
    n = a_t.shape[-1]
    grp = jnp.moveaxis(a_t, -1, 0).reshape(n // g, g, *a_t.shape[:-1])
    # explicit masked adds over the g bits: u64 dot_general does not
    # lower on TPU (X64 rewriting unimplemented), and g <= 4 anyway
    e = jnp.zeros((n // g, v_count) + a_t.shape[:-1], dtype=U64)
    for i in range(g):
        mask = jnp.asarray(
            [(v >> i) & 1 for v in range(v_count)], dtype=U64
        )  # (V,)
        shaped = mask.reshape((1, v_count) + (1,) * (a_t.ndim - 1))
        e = e + shaped * grp[:, None, i]
    return e % U64(two_n)


def multibit_blind_rotate(
    lut: jax.Array,
    lwe_ct: jax.Array,
    bsk: MultiBitBootstrapKey,
    engine: NegacyclicEngine,
    table: jax.Array | None = None,
) -> jax.Array:
    """Blind rotation over n/g aggregated-GGSW steps.

    lut: (k+1, N) accumulator; lwe_ct: (..., n+1). XLA reference path
    (the fused Pallas group-step kernel in ops/pallas_multibit.py covers
    the flagship shape and is selected automatically when available).
    `table` is the monomial_x_table -- computed eagerly by the caller
    when this runs under an enclosing jit."""
    n_poly = bsk.poly_size
    two_n = 2 * n_poly
    log_2n = int(math.log2(two_n))
    ms = mod_switch(lwe_ct, log_2n)
    a_t = ms[..., :-1]
    b_t = ms[..., -1]
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (lut.shape[-2], n_poly))
    e_all = group_exponents(a_t, bsk.group_size, two_n)  # (G, V, ...)
    if table is None:
        table = (
            bsk.rot_table
            if bsk.rot_table is not None
            else monomial_x_table(engine)  # legacy deserialized keys
        )

    if (
        getattr(engine, "use_pallas", False)
        and bsk.gadget.level == 1
        and lut.shape[-2] == 2
    ):
        from tfhe_tpu.ops.pallas_multibit import multibit_rotate_fused

        return multibit_rotate_fused(acc, e_all, bsk, engine, table)

    gadget = bsk.gadget

    def step(carry, xs):
        bsk_j, e_j = xs  # (V, D, k+1, P, 2, N), (V, ...)
        mono = table[e_j]  # (V, ..., P, 2, N)
        # aggregate: sum_v mono_v * BSK_v  (values in [0, 2p) summed in u64)
        bv = bsk_j[..., 0, :]  # (V, D, k+1, P, N)
        batch_dims = mono.ndim - 4  # leading ... of the ciphertext batch
        # align: fa (V, 1.., D, k+1, P, N) against mono (V, ..., 1, 1, P, 2, N)
        fa = bv.reshape(bv.shape[0], *([1] * batch_dims), *bv.shape[1:])
        key = jnp.expand_dims(mono, axis=(-4, -5))
        prod = engine.pointwise_shoup(fa, key)  # (V, ..., D, k+1, P, N)
        agg = engine.reduce_u64_domain(
            jnp.sum(prod.astype(U64), axis=0), canonical=True
        )  # (..., D, k+1, P, N)
        fd = decompose_forward(carry, gadget, engine)  # (..., D, P, N)
        ep = engine.pointwise_mul(fd[..., :, None, :, :], agg)
        s = engine.reduce_u64_domain(
            jnp.sum(ep.astype(U64), axis=-4), canonical=True
        )
        new = finalize_residues(s, engine, shift=bsk.shift)
        return new, None

    acc, _ = jax.lax.scan(step, acc, (bsk.bsk_ntt, e_all))
    return acc


@functools.partial(jax.jit, static_argnames=("engine",))
def _mb_pbs_jit(lwe_ct, lut, bsk, table, engine):
    acc = multibit_blind_rotate(lut, lwe_ct, bsk, engine, table=table)
    return sample_extract(acc, 0)


@functools.partial(jax.jit, static_argnames=("engine",))
def _mb_ks_pbs_jit(big_lwe_ct, lut, bsk, ksk, table, engine):
    from tfhe_tpu.core.lwe import keyswitch

    small = keyswitch(big_lwe_ct, ksk)
    acc = multibit_blind_rotate(lut, small, bsk, engine, table=table)
    return sample_extract(acc, 0)


def multibit_keyswitch_pbs(
    big_lwe_ct: jax.Array,
    lut: jax.Array,
    bsk: MultiBitBootstrapKey,
    ksk,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Keyswitch-down + multi-bit PBS as ONE device program: eager
    callers otherwise pay two dispatch floors per batch (the keyswitch
    jit and the PBS jit) -- ~37 ms each on the tunneled backend."""
    table = (
        bsk.rot_table if bsk.rot_table is not None else monomial_x_table(engine)
    )
    return _mb_ks_pbs_jit(big_lwe_ct, lut, bsk, ksk, table, engine)


def multibit_programmable_bootstrap(
    lwe_ct: jax.Array,
    lut: jax.Array,
    bsk: MultiBitBootstrapKey,
    engine: NegacyclicEngine,
) -> jax.Array:
    """Multi-bit PBS: blind rotate (n/g steps) + sample extract.

    Eager wrapper: the monomial table is materialized OUTSIDE the trace
    and enters the jitted program as an argument (device-resident, never
    a baked-in constant)."""
    table = (
        bsk.rot_table if bsk.rot_table is not None else monomial_x_table(engine)
    )
    return _mb_pbs_jit(lwe_ct, lut, bsk, table, engine)
