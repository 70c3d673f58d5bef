"""Fused multi-bit blind-rotation group-step kernel.

One Pallas kernel per GROUP of g secret bits (core/multibit.py math):

    acc <- EP( sum_v (prod_{i in v} m_i) . BSK_v ,  acc )

with m_i = NTT(X^{a_i}) Shoup rows for the group's g exponents. The
2^g-term aggregation is HORNER-FACTORED over the bits,

    H = H_{v_g-1 = 0} + m_{g-1} . H_{v_g-1 = 1}   (recursively)

so only the g base rows are gathered from HBM (not 2^g) and EVERY
multiply uses a Shoup-companioned operand -- no variable x variable
Barrett anywhere. The external product distributes into the aggregation
(inner_v = sum_d fdm_d . BSK_{v,d,c} uses the precomputed BSK Shoup
pairs), so the whole group-step is transforms + pure Shoup pointwise:

    cost(group-step) ~ cost(classic step) + 2^g * 4 Shoup muls/pt
    steps: n -> n/g        (transforms are 80% of the classic step)

Flagship shape only (gadget level 1, k = 1); other shapes use the XLA
path in core/multibit.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.ops.folded_ntt import (
    FoldedCrtEngine,
    _condsub,
    shoup_mulmod,
)
from tfhe_tpu.ops.pallas_blind_rotate import make_garner_pair
from tfhe_tpu.ops.pallas_ntt import (
    PallasNttTables,
    _Z,
    _limb_dtype,
    fwd_prime,
    fwd_prime_packed,
    inv_prime,
    inv_prime_packed,
    make_fwd_rhs,
    make_fwd_rhs_packed,
    packed_kernels_enabled,
)

U32 = jnp.uint32
I32 = jnp.int32


def make_pallas_multibit_step(
    engine: FoldedCrtEngine, base_log: int, shift: int, group_size: int,
    tm: int = 16,
):
    """Returns step(acc_lo, acc_hi, monov, monos, bskv, bsks) -> (lo, hi):
      acc_*: (B*2, N) u32 accumulator planes (k+1 = 2)
      monov/monos: (g, B*P, N) u32 -- NTT(X^{a_i}) Shoup rows per group
                   bit, gathered by the caller (ct-major, prime-minor)
      bskv/bsks: (2^g * 4P, N) u32 -- the group's pattern GGSWs, rows
                 ordered (v, prime, d, c) = v*4P + i*4 + d*2 + c.
    The output REPLACES the accumulator (acc <- EP(agg, acc))."""
    g = group_size
    v_count = 1 << g
    n = engine.n
    n_pr = engine.n_primes
    tables = PallasNttTables(engine)
    cd, rd = tables.c_dim, tables.r_dim
    ctxs = [ntt.ctx for ntt in engine.ntts]
    big_c, big_r = cd > 64, rd > 64
    na = tables.na
    ld = _limb_dtype()
    packed = packed_kernels_enabled()
    assert 1 <= base_log <= 31
    half_hi = np.uint32(1 << (64 - base_log - 1 - 32))
    st_shift = np.uint32(64 - base_log - 32)
    b_half = np.int32(1 << (base_log - 1))
    b_full = np.int32(1 << base_log)
    garner = make_garner_pair(engine, shift)

    def _horner(inners, mv, ms, ctx, bits):
        """Sum_v (prod_{i in v} m_i) * inner_v over v-subsets of `bits`,
        factored so each multiply is one Shoup product by m_i."""
        if len(bits) == 0:
            return inners[0]
        b = bits[-1]
        lo_set = {v: x for v, x in inners.items() if not (v >> b) & 1}
        hi_set = {
            v ^ (1 << b): x for v, x in inners.items() if (v >> b) & 1
        }
        lo = _horner(lo_set, mv, ms, ctx, bits[:-1])
        hi = _horner(hi_set, mv, ms, ctx, bits[:-1])
        term = shoup_mulmod(_condsub(hi, ctx.pu), mv[b], ms[b], ctx.pu)
        return _condsub(lo + term, ctx.two_p)

    def _one_step(lo, hi, mv_all, ms_all, bv, bs):
        dh2 = hi + half_hi
        state = (dh2 >> st_shift).astype(I32)
        d = state - jnp.where(state >= b_half, b_full, np.int32(0))
        mk_rhs = make_fwd_rhs_packed if packed else make_fwd_rhs
        rhs1 = mk_rhs(d, cd, rd, tm * 2, 3, ld)
        res = []
        for i in range(n_pr):
            ctx = ctxs[i]
            if packed:
                fd = fwd_prime_packed(
                    rhs1, i, v_tabs[0], v_tabs[1], v_tabs[2], v_tabs[3], ctx,
                    cd, rd, tm * 2, tables.vp3_nk, tables.wrp_nk, n, na,
                )
            else:
                fd = fwd_prime(
                    rhs1, i, v_tabs[0], v_tabs[1], v_tabs[2], v_tabs[3], ctx,
                    cd, rd, tm * 2, 3, big_c, big_r, n, na,
                )  # (tm*2, N) u32 in [0, 2p)
            fdm = fd.reshape(tm, 2, n)
            mv = [mv_all[b][:, i, :] for b in range(g)]  # (tm, N) each
            ms = [ms_all[b][:, i, :] for b in range(g)]
            outs = []
            for c in range(2):
                inners = {}
                for v in range(v_count):
                    base = v * 4 * n_pr + 4 * i
                    t0 = shoup_mulmod(
                        fdm[:, 0, :], bv[base + c], bs[base + c], ctx.pu
                    )
                    t1 = shoup_mulmod(
                        fdm[:, 1, :], bv[base + 2 + c], bs[base + 2 + c],
                        ctx.pu,
                    )
                    inners[v] = _condsub(t0 + t1, ctx.two_p)
                s = _horner(inners, mv, ms, ctx, tuple(range(g)))
                outs.append(_condsub(_condsub(s, ctx.two_p), ctx.pu))
            prodm = jnp.stack(outs, axis=1).reshape(tm * 2, n)
            if packed:
                res.append(
                    inv_prime_packed(
                        prodm, i, i_tabs[0], i_tabs[1], i_tabs[2],
                        i_tabs[3], ctx, cd, rd, tm * 2, tables.wip_nk,
                        tables.vip_nk, n, ld, na,
                    )
                )
            else:
                res.append(
                    inv_prime(
                        prodm, i, i_tabs[0], i_tabs[1], i_tabs[2],
                        i_tabs[3], ctx, cd, rd, tm * 2, big_c, big_r, n, ld,
                        na,
                    )
                )
        # Garner -> u64 planes; REPLACES the accumulator
        return garner(res)

    v_tabs = [None] * 4
    i_tabs = [None] * 4

    def kernel(lo_ref, hi_ref, mv_ref, ms_ref, bv_ref, bs_ref,
               v_t, wr_t, g_t, gs_t, wi_t, vi_t, gi_t, gis_t,
               olo_ref, ohi_ref):
        v_tabs[:] = [v_t, wr_t, g_t, gs_t]
        i_tabs[:] = [wi_t, vi_t, gi_t, gis_t]
        mv = [mv_ref[b].reshape(tm, n_pr, n) for b in range(g)]
        ms = [ms_ref[b].reshape(tm, n_pr, n) for b in range(g)]
        lo, hi = _one_step(lo_ref[:], hi_ref[:], mv, ms, bv_ref, bs_ref)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    t = tables
    if packed:
        fv, fw, iw, iv = t.vp, t.wrp, t.wip, t.vip
    else:
        fv, fw, iw, iv = t.v, t.wr, t.wi, t.vi

    @jax.jit
    def step(acc_lo, acc_hi, monov, monos, bskv, bsks):
        b2 = acc_lo.shape[0]
        grid = (b2 // (2 * tm),)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(_Z for _ in a.shape))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
                pl.BlockSpec((g, n_pr * tm, n), lambda i: (_Z, i, _Z)),
                pl.BlockSpec((g, n_pr * tm, n), lambda i: (_Z, i, _Z)),
                full(bskv),
                full(bsks),
                full(fv), full(fw), full(t.g), full(t.gs),
                full(iw), full(iv), full(t.gi), full(t.gis),
            ],
            out_specs=[
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b2, n), U32),
                jax.ShapeDtypeStruct((b2, n), U32),
            ],
            # the 2^g inner products peak ~18 MB of scoped VMEM at g=3
            # (the 16 MB default is a scheduler budget, not hardware).
            # g=4 at tm=128 peaks 110.7 MB -- raise the budget only
            # there so the proven g<=3 Mosaic scheduling is untouched
            # (an oversized budget measurably degrades scheduling,
            # PERF_NOTES round-2 twist-fold lesson)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(116 if g >= 4 else 110) * 1024 * 1024
            ),
            interpret=jax.default_backend() != "tpu",
        )(
            acc_lo, acc_hi, monov, monos, bskv, bsks,
            fv, fw, t.g, t.gs, iw, iv, t.gi, t.gis,
        )

    return step


def multibit_bsk_to_step_layout(bsk_ntt: jax.Array):
    """(G, V, D=2, k+1=2, P, 2, N) -> per-group (G, V*4P, N) value and
    Shoup arrays, rows ordered (v, prime, d, c)."""
    v = bsk_ntt[..., 0, :]  # (G, V, 2, 2, P, N)
    s = bsk_ntt[..., 1, :]
    gdim, vdim = v.shape[0], v.shape[1]
    rows = vdim * 4 * bsk_ntt.shape[-3]
    v = jnp.transpose(v, (0, 1, 4, 2, 3, 5)).reshape(gdim, rows, -1)
    s = jnp.transpose(s, (0, 1, 4, 2, 3, 5)).reshape(gdim, rows, -1)
    return v, s


def multibit_rotate_fused(acc, e_all, bsk, engine, table) -> jax.Array:
    """Fused scan driver (core/multibit.py dispatches here on the
    flagship shape). acc: (..., 2, N) u64; e_all: (G, V, ...) subset-sum
    exponents -- only the g single-bit rows are used (Horner form);
    table: monomial_x_table rows, passed in (jit-argument discipline)."""
    import os

    g = bsk.group_size
    batch = acc.shape[:-2]
    n_poly = acc.shape[-1]
    b = int(np.prod(batch)) if batch else 1
    # adaptive tile rows: bigger tiles = fewer grid steps + larger matmul
    # M dims (16/32/64/128 measured 397/476/487/499 PBS/s at batch 512);
    # small batches shrink the tile so padding never dominates
    env_tm = os.environ.get("TFHE_TPU_TM")
    if env_tm:
        tm = int(env_tm)
    else:
        tm = 16
        while tm < 128 and tm < b:
            tm *= 2
    pad = (-b) % tm
    flat = acc.reshape(b, 2, n_poly)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 2, n_poly), dtype=flat.dtype)], axis=0
        )
    bp = b + pad
    lo = (flat & jnp.uint64(0xFFFFFFFF)).astype(U32).reshape(-1, n_poly)
    hi = (flat >> jnp.uint64(32)).astype(U32).reshape(-1, n_poly)

    # single-bit exponents: subset v = 1 << i
    bit_vs = [1 << i for i in range(g)]
    e_bits = jnp.stack(
        [e_all[:, v].reshape(e_all.shape[0], -1) for v in bit_vs], axis=1
    ).astype(jnp.int32)  # (G, g, B)
    if pad:
        e_bits = jnp.concatenate(
            [e_bits, jnp.zeros((e_bits.shape[0], g, pad), dtype=jnp.int32)],
            axis=2,
        )
    bv, bs = multibit_bsk_to_step_layout(bsk.bsk_ntt)
    scan_fn = _scan_rotate(engine, bsk.gadget.base_log, bsk.shift, g, tm)
    lo, hi = scan_fn(lo, hi, bv, bs, e_bits, table)
    out = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
    out = out.reshape(-1, 2, n_poly)[:b]
    return out.reshape(*batch, 2, n_poly)


@functools.lru_cache(maxsize=None)
def _scan_rotate(engine, base_log: int, shift: int, g: int, tm: int):
    """Jitted scan over group-steps; the monomial table and BSK enter as
    ARGUMENTS (device-resident, never compile-payload constants)."""
    step_fn = make_pallas_multibit_step(engine, base_log, shift, g, tm=tm)
    n_poly = engine.n
    n_pr = engine.n_primes

    @jax.jit
    def run(lo, hi, bv, bs, e_bits, table):
        bp = lo.shape[0] // 2

        def body(carry, xs):
            clo, chi = carry
            bvj, bsj, ej = xs  # (V*4P, N) x2, (g, BP)
            rows = table[ej]  # (g, BP, P, 2, N)
            mv = rows[..., 0, :].reshape(g, bp * n_pr, n_poly)
            ms = rows[..., 1, :].reshape(g, bp * n_pr, n_poly)
            clo, chi = step_fn(clo, chi, mv, ms, bvj, bsj)
            return (clo, chi), None

        (lo, hi), _ = jax.lax.scan(body, (lo, hi), (bv, bs, e_bits))
        return lo, hi

    return run
