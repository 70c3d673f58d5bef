"""Fully-fused blind-rotation step: ONE Pallas kernel per scan step.

Uses the rotation-free CMux form

    acc += (X^{a_j} - 1) * EP(BSK_j, acc)

so the data-dependent negacyclic rotation never touches the coefficient
domain: (X^{a_j} - 1) is applied as a pointwise NTT-domain Shoup multiply
by a precomputed monomial-transform table row gathered per ciphertext
(monomial_ntt_table). A coefficient-domain barrel rotation inside the
kernel costs 12 rounds of unaligned lane concats (measured slower than
the unfused path); the table form is pure elementwise math -- the shape
TPUs want. Identity check: EP(bsk_j, X) ~ s_j * X, so
acc + (X^a-1) EP(acc) = acc + s_j (X^a - 1) acc = CMux(s_j; acc, X^a acc).

Covers the flagship shape (gadget level 1, k = 1); other parameter sets
fall back to the XLA scan in core/bootstrap.py. The accumulator rides as
u32 (lo, hi) planes; decomposition, Garner and accumulation are u32 pair
arithmetic (no u64 anywhere, PERF_NOTES.md). NTT stages reuse
ops/pallas_ntt.fwd_prime/inv_prime, so FoldedCrtEngine key material is
consumed unchanged.
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
    _mulhi_u32,
    shoup_mulmod,
)
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
_N1 = np.uint32(1)


def _add_pair(al, ah, bl, bh):
    lo = al + bl
    carry = jnp.where(lo < al, _N1, np.uint32(0))
    return lo, ah + bh + carry


def _sub_pair(al, ah, bl, bh):
    lo = al - bl
    borrow = jnp.where(al < bl, _N1, np.uint32(0))
    return lo, ah - bh - borrow


def _mul32x32(a, b):
    return a * b, _mulhi_u32(a, b)


def make_garner_pair(engine: FoldedCrtEngine, shift: int):
    """Kernel-side Garner: per-prime canonical residues -> signed CRT
    value mod 2^64 as (lo, hi) u32 planes, shifted left by `shift`.

    Generic over the engine's 2-4 prime set via engine.garner
    (GarnerConsts: numpy-scalar constants, kernel-literal safe). Same
    math as FoldedCrtEngine.crt_reconstruct with the u64 Horner replaced
    by u32 pair arithmetic (no u64 anywhere inside Pallas)."""
    g = engine.garner
    ctxs = [ntt.ctx for ntt in engine.ntts]
    n_pr = g.np
    p_u = g.p_u32
    prod_lo, prod_hi = g.prod_lo, g.prod_hi
    h = g.h
    sh = shift
    assert 0 <= sh < 32

    def garner(res):
        # mixed-radix digits v[i] in [0, p_i); primes ascending keeps the
        # lazy Horner bound < 3p_i (one condsub restores [0, 2p_i))
        v = [res[0]]
        for i in range(1, n_pr):
            ctx = ctxs[i]
            t = v[i - 1]
            for j in range(i - 2, -1, -1):
                w, ws = g.pmod[i][j]
                t = _condsub(shoup_mulmod(t, w, ws, ctx.pu) + v[j], ctx.two_p)
            d = res[i] + ctx.two_p - _condsub(t, ctx.two_p)
            w, ws = g.inv[i]
            v.append(_condsub(shoup_mulmod(d, w, ws, ctx.pu), ctx.pu))
        # x = v0 + p0(v1 + p1(v2 + ...)) mod 2^64, Horner from the top
        xl = v[-1]
        xh = jnp.zeros_like(xl)
        for j in range(n_pr - 2, -1, -1):
            tl, th = _mul32x32(p_u[j], xl)
            th = th + p_u[j] * xh  # (p_j * xh) << 32 wraps into hi
            xl, xh = _add_pair(tl, th, v[j], jnp.zeros_like(v[j]))
        # negative range: lexicographic digit compare vs prod//2
        neg = v[-1] > h[-1]
        eq = v[-1] == h[-1]
        for j in range(n_pr - 2, -1, -1):
            neg = neg | (eq & (v[j] > h[j]))
            eq = eq & (v[j] == h[j])
        xl, xh = _sub_pair(
            xl, xh,
            jnp.where(neg, prod_lo, np.uint32(0)),
            jnp.where(neg, prod_hi, np.uint32(0)),
        )
        if sh:
            xh = (xh << np.uint32(sh)) | (xl >> np.uint32(32 - sh))
            xl = xl << np.uint32(sh)
        return xl, xh

    return garner


@functools.lru_cache(maxsize=None)
def monomial_ntt_table(engine: FoldedCrtEngine):
    """(2N, P, 2, N) u32: Shoup pairs of NTT(X^e - 1) for e in [0, 2N).
    X^{N+j} = -X^j; e = 0 gives the zero polynomial (CMux no-op)."""
    n = engine.n
    polys = np.zeros((2 * n, n), dtype=np.int32)
    for e in range(2 * n):
        if e < n:
            polys[e, e] += 1
        else:
            polys[e, e - n] -= 1
        polys[e, 0] -= 1
    # concrete even when first called under an outer jit trace: the
    # result is lru-cached, and caching a traced value poisons every
    # later program with the stale tracer (KeyError: Var)
    with jax.ensure_compile_time_eval():
        f = engine.forward_small(jnp.asarray(polys))  # (2N, P, N)
        return engine.make_shoup(f)  # (2N, P, 2, N)


def make_pallas_blind_rotate(
    engine: FoldedCrtEngine, base_log: int, shift: int, tm: int = 16,
    steps: int = 1, _skip: frozenset = frozenset(),
):
    """Returns step(acc_lo, acc_hi, rotv, rots, bskv, bsks) -> (lo, hi):
      acc_*: (B*2, N) u32 planes of the GLWE accumulator (k+1 = 2)
      rotv/rots: (steps, B*P, N) u32 -- per-ciphertext NTT(X^{a_j} - 1)
                 Shoup rows (ct-major, prime-minor), gathered from
                 monomial_ntt_table by the caller
      bskv/bsks: (steps, 4P, N) u32 -- the GGSWs in Shoup form, rows
                 ordered (prime, d, c) = i*4 + d*2 + c.
    `steps` consecutive CMux steps run inside ONE kernel invocation so
    the accumulator round-trips HBM once per `steps` instead of per step.
    """
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
    # decomposition constants (level 1): state = (x + 2^(63-B)) >> (64-B);
    # the rounding half has zero low bits so only the hi plane moves
    half_hi = np.uint32(1 << (64 - base_log - 1 - 32))
    st_shift = np.uint32(64 - base_log - 32)
    b_half = np.int32(1 << (base_log - 1))
    b_full = np.int32(1 << base_log)
    garner = make_garner_pair(engine, shift)

    def _one_step(lo, hi, rv, rs, bv, bs):
        # decompose acc directly (level 1, base_log)
        dh2 = hi + half_hi
        state = (dh2 >> st_shift).astype(I32)
        d = state - jnp.where(state >= b_half, b_full, np.int32(0))
        # forward NTT of digits (rows = (ct, d)), 3 planes
        mk_rhs = make_fwd_rhs_packed if packed else make_fwd_rhs
        rhs1 = mk_rhs(d, cd, rd, tm * 2, 3, ld)
        res = []
        for i in range(n_pr):
            ctx = ctxs[i]
            if "fwd" in _skip:
                fd = d.astype(U32)
            elif packed:
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
            outs = []
            for c in range(2):
                if "ep" in _skip:
                    outs.append(_condsub(fdm[:, c, :], ctx.pu))
                    continue
                t0 = shoup_mulmod(fdm[:, 0, :], bv[4 * i + c], bs[4 * i + c], ctx.pu)
                t1 = shoup_mulmod(
                    fdm[:, 1, :], bv[4 * i + 2 + c], bs[4 * i + 2 + c], ctx.pu
                )
                s = _condsub(t0 + t1, ctx.two_p)  # EP in NTT domain
                # rotation: pointwise (X^a - 1) multiply, per ciphertext
                if "rot" not in _skip:
                    s = shoup_mulmod(s, rv[:, i, :], rs[:, i, :], ctx.pu)
                outs.append(_condsub(_condsub(s, ctx.two_p), ctx.pu))
            prodm = jnp.stack(outs, axis=1).reshape(tm * 2, n)
            if "inv" in _skip:
                res.append(prodm)
                continue
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
        # Garner: residues -> u64 pair, centered, << shift
        if "garner" in _skip:
            r_sum = res[1]
            for rr in res[2:]:
                r_sum = _condsub(r_sum + rr, ctxs[-1].two_p)
            return _add_pair(lo, hi, res[0], r_sum)
        xl, xh = garner(res)
        return _add_pair(lo, hi, xl, xh)

    v_tabs = [None] * 4
    i_tabs = [None] * 4

    def kernel(lo_ref, hi_ref, rv_ref, rs_ref, bv_ref, bs_ref,
               v_t, wr_t, g_t, gs_t, wi_t, vi_t, gi_t, gis_t,
               olo_ref, ohi_ref):
        v_tabs[:] = [v_t, wr_t, g_t, gs_t]
        i_tabs[:] = [wi_t, vi_t, gi_t, gis_t]
        lo = lo_ref[:]  # (tm*2, N)
        hi = hi_ref[:]
        for s_idx in range(steps):
            rv = rv_ref[s_idx].reshape(tm, n_pr, n)
            rs = rs_ref[s_idx].reshape(tm, n_pr, n)
            lo, hi = _one_step(lo, hi, rv, rs, bv_ref[s_idx], bs_ref[s_idx])
        olo_ref[:] = lo
        ohi_ref[:] = hi

    t = tables
    # table selection: packed kernels swap the four stage matrices for
    # their block-Toeplitz forms (same arg positions, larger shapes)
    if packed:
        fv, fw, iw, iv = t.vp, t.wrp, t.wip, t.vip
    else:
        fv, fw, iw, iv = t.v, t.wr, t.wi, t.vi

    @jax.jit
    def step(acc_lo, acc_hi, rotv, rots, bskv, bsks):
        b2 = acc_lo.shape[0]
        grid = (b2 // (2 * tm),)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(_Z for _ in a.shape))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
                pl.BlockSpec((2 * tm, n), lambda i: (i, _Z)),
                pl.BlockSpec((steps, n_pr * tm, n), lambda i: (_Z, i, _Z)),
                pl.BlockSpec((steps, n_pr * tm, n), lambda i: (_Z, i, _Z)),
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
            # steps > 4 exceeds the 16 MiB default scoped-VMEM budget;
            # v5e's physical VMEM is far larger, so lift the scheduler
            # cap for experiments (harmless at steps <= 4)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            )
            if steps > 4 or tm > 16
            else None,
            interpret=jax.default_backend() != "tpu",
        )(
            acc_lo, acc_hi, rotv, rots, bskv, bsks,
            fv, fw, t.g, t.gs, iw, iv, t.gi, t.gis,
        )

    return step


def bsk_to_step_layout(bsk_ntt: jax.Array) -> tuple[jax.Array, jax.Array]:
    """BootstrapKey.bsk_ntt (n, D=2, k+1=2, P, 2, N) -> per-step
    (n, 4P, N) value and Shoup arrays, rows ordered (prime, d, c)."""
    v = bsk_ntt[..., 0, :]  # (n, 2, 2, P, N)
    s = bsk_ntt[..., 1, :]
    rows = 4 * bsk_ntt.shape[-3]
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(bsk_ntt.shape[0], rows, -1)
    s = jnp.transpose(s, (0, 3, 1, 2, 4)).reshape(bsk_ntt.shape[0], rows, -1)
    return v, s
