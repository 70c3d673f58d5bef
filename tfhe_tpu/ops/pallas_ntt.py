"""Pallas TPU kernels for the folded CRT-NTT.

Fuses each direction of the 3-prime folded four-step NTT
(ops/folded_ntt.py) into ONE kernel so the 16x digit-block f32
intermediates never touch HBM — on the measured chip profile
(PERF_NOTES.md) the XLA path is HBM-bound on exactly those tensors.

Math identical to FoldedNtt with the per-output-batch twiddles pulled out
of the batched stage-2 matrices, so both DFT stages are single *shared*
MXU matmuls plus one elementwise Shoup multiply (G = (w^t psi)^r):

    forward:  y[t,r]  = sum_c V[t,c] * x[r + R*c]        (shared matmul)
              y'[t,r] = y[t,r] * G[t,r]                  (u32 Shoup)
              out[t*R+s] = sum_r W_R[s,r] * y'[t,r]      (shared matmul)
    inverse:  U[t,r]  = Gi[t,r] * sum_s Wi[r,s] f[t*R+s]
              a[r+R*c] = sum_t Vi[c,t] * U[t,r]

Layout rules (probed on this Mosaic toolchain, scripts/probe_mosaic):
every reshape keeps the minor dim a 128-multiple, no strided lane
slices; with R = 128 (ops/folded_ntt._factor) the coefficient
lane-split (TM, N) -> (TM, C, 128) is free, the dominant matmul
contracts a full 128 MXU tile, and the stage-2 block views have
minor >= C*TM >= 128. Digit-pair products recombine mod p in u32 Shoup
arithmetic inside VMEM (big-K variant for the K=128 contraction).

The kernels reproduce FoldedNtt's output layout (h = t*R + s) exactly
mod p, so Shoup key material prepared by the XLA engine is directly
consumable. Replaces what the reference delegates to tfhe-rs' f64 FFT
(ml/extensions/rust/src/compression.rs:6 fft_impl); this is the
framework's hottest kernel (every PBS step runs 12 such transforms).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tfhe_tpu.ops.folded_ntt import (
    FoldedCrtEngine,
    _balanced_digits_host,
    _condsub,
    shoup_mulmod,
)


def _limb_dtype():
    """Kernel digit-plane dtype: int8 on TPU (the MXU's fastest exact
    path -- digit planes are balanced base-256, always in [-128, 127]);
    f32 in interpret mode (CPU has no int8 dot thunk)."""
    import jax as _jax

    return jnp.int8 if _jax.default_backend() == "tpu" else jnp.float32
from tfhe_tpu.ops.polynomial import _primitive_root

U32 = jnp.uint32
I32 = jnp.int32
# index-map constants: np.int32 so Mosaic sees i32 under jax x64 mode
_Z = np.int32(0)


def packed_kernels_enabled() -> bool:
    """Block-Toeplitz packed stage matmuls (TFHE_TPU_PACKED, default on):
    the digit cross-plane sums run inside the MXU contraction instead of
    as VPU adds. Read at kernel-build time; A/B in separate processes
    (the step builders are lru-cached per process)."""
    import os

    return os.environ.get("TFHE_TPU_PACKED", "1") == "1"


def _stack_digits(m: np.ndarray, p: int, na: int = 4) -> np.ndarray:
    """(D1, D2) matrix mod p -> (na*D1, D2) stacked balanced digit planes
    (row a*D1 + i is digit a of row i). na=3 needs p <= 16580352
    (centered residues fit three planes, folded_ntt.FoldedNtt.na)."""
    d = _balanced_digits_host(m, p, na)  # (D1, D2, na)
    return np.concatenate([d[..., a] for a in range(na)], axis=0)


def _stack_digits_packed(m: np.ndarray, p: int, nb_rhs: int,
                         split3: bool, na: int = 4) -> tuple[np.ndarray, int]:
    """(D1, D2) table mod p -> block-Toeplitz packed lhs
    (nk*D1, nb_rhs*D2), plus nk.

    Row-block k / col-block b holds table digit plane a = k - b (zero
    outside 0..3), so ONE matmul with the rhs digit planes stacked along
    the contraction axis computes every cross-plane sum
    s_k = sum_{a+b=k} T_a . x_b directly in the MXU: the contraction
    depth grows from D2 to nb_rhs*D2 (the systolic array is 128 deep --
    D2 = 32/64 leaves it 2-4x idle) and the VPU block adds disappear.
    MAC count grows ~1.75x but runs at ~4x better MXU occupancy, and
    every s_k lands as one contiguous row-block for the recombiner.

    With split3 (contraction dims > 64, na=4 only), row-block k=3 is
    emitted twice (a in {0,1}, then {2,3}) so the recombination's s<<8
    stays inside i32 -- same overflow guard as _recombine's big-K path.
    na=3 planes never need the split (max 3 blocks per class)."""
    d = _balanced_digits_host(m, p, na)  # (D1, D2, na)
    d1, d2 = m.shape
    nk = na + nb_rhs - 1
    split3 = split3 and na == 4
    keys: list[tuple[int, tuple | None]] = []
    for k in range(nk):
        if split3 and k == 3:
            keys.append((3, (0, 1)))
            keys.append((3, (2, 3)))
        else:
            keys.append((k, None))
    out = np.zeros((len(keys) * d1, nb_rhs * d2), dtype=np.float32)
    for ki, (k, asub) in enumerate(keys):
        for b in range(nb_rhs):
            a = k - b
            if 0 <= a <= na - 1 and (asub is None or a in asub):
                out[ki * d1:(ki + 1) * d1, b * d2:(b + 1) * d2] = d[..., a]
    return out, len(keys)


class PallasNttTables:
    """Per-engine constant tables, stacked over the engine's primes."""

    def __init__(self, engine: FoldedCrtEngine):
        self.engine = engine
        n = engine.n
        ntt0 = engine.ntts[0]
        r_dim, c_dim = ntt0.r_dim, ntt0.c_dim
        self.n, self.r_dim, self.c_dim = n, r_dim, c_dim
        # digit planes for table entries AND mid-stage values: 3 when
        # centered residues fit three balanced digits (2^24-class primes,
        # folded_ntt.FoldedNtt.na), else 4. Uniform across the engine's
        # primes (asserted in FoldedCrtEngine.__init__).
        na = ntt0.na
        self.na = na
        vs, wrs, gs, gss = [], [], [], []
        wis, vis, gis, giss = [], [], [], []
        vps, wrps, wips, vips = [], [], [], []
        for ntt in engine.ntts:
            p = ntt.p
            g = _primitive_root(p)
            psi = pow(g, (p - 1) // (2 * n), p)
            omega = psi * psi % p
            om_r = pow(omega, c_dim, p)
            om_c = pow(omega, r_dim, p)
            psi_inv = pow(psi, p - 2, p)
            om_inv = pow(omega, p - 2, p)
            om_r_inv = pow(om_r, p - 2, p)
            om_c_inv = pow(om_c, p - 2, p)
            n_inv = pow(n, p - 2, p)
            v = np.empty((c_dim, c_dim), dtype=np.uint64)
            for t in range(c_dim):
                for c in range(c_dim):
                    v[t, c] = pow(om_c, c * t, p) * pow(psi, r_dim * c, p) % p
            wr = np.empty((r_dim, r_dim), dtype=np.uint64)
            for s in range(r_dim):
                for r in range(r_dim):
                    wr[s, r] = pow(om_r, r * s, p)
            gm = np.empty((c_dim, r_dim), dtype=np.uint64)
            for t in range(c_dim):
                base = pow(omega, t, p) * psi % p
                for r in range(r_dim):
                    gm[t, r] = pow(base, r, p)
            wi = np.empty((r_dim, r_dim), dtype=np.uint64)
            for r in range(r_dim):
                for s in range(r_dim):
                    wi[r, s] = pow(om_r_inv, r * s, p)
            gim = np.empty((c_dim, r_dim), dtype=np.uint64)
            for t in range(c_dim):
                base = pow(om_inv, t, p) * psi_inv % p
                for r in range(r_dim):
                    gim[t, r] = pow(base, r, p) * n_inv % p
            vi = np.empty((c_dim, c_dim), dtype=np.uint64)
            for c in range(c_dim):
                fold = pow(psi_inv, r_dim * c, p)
                for t in range(c_dim):
                    vi[c, t] = pow(om_c_inv, c * t, p) * fold % p
            vs.append(_stack_digits(v, p, na))
            wrs.append(_stack_digits(wr, p, na))
            wis.append(_stack_digits(wi, p, na))
            vis.append(_stack_digits(vi, p, na))
            # packed rhs plane counts: forward stage 1 consumes 3-plane
            # gadget-digit rhs always; every other stage consumes
            # na-plane mid-value/input rhs
            vp, self.vp3_nk = _stack_digits_packed(v, p, 3, c_dim > 64, na)
            wp, self.wrp_nk = _stack_digits_packed(wr, p, na, r_dim > 64, na)
            wip_, self.wip_nk = _stack_digits_packed(wi, p, na, r_dim > 64, na)
            vip_, self.vip_nk = _stack_digits_packed(vi, p, na, c_dim > 64, na)
            vps.append(vp)
            wrps.append(wp)
            wips.append(wip_)
            vips.append(vip_)
            sh = lambda x: ((x.astype(object) << 32) // p).astype(np.uint32)
            gs.append(gm.astype(np.uint32))
            gss.append(sh(gm))
            gis.append(gim.astype(np.uint32))
            giss.append(sh(gim))
        # NUMPY (not jnp): these tables are built lazily, possibly inside
        # a jit trace; jnp arrays created there are constant TRACERS, and
        # caching them (lru_cache on the step builders) leaks them into
        # other traces (UnexpectedTracerError on the second program).
        # As numpy they convert to per-program constants at each trace --
        # ~600 KB total, negligible in the compile payload.
        ld = np.int8 if _limb_dtype() == jnp.int8 else np.float32
        self.v = np.stack(vs).astype(ld)  # (3, 4C, C)
        self.wr = np.stack(wrs).astype(ld)  # (3, 4R, R)
        self.wi = np.stack(wis).astype(ld)  # (3, 4R, R)
        self.vi = np.stack(vis).astype(ld)  # (3, 4C, C)
        # block-Toeplitz packed variants (TFHE_TPU_PACKED kernels)
        self.vp = np.stack(vps).astype(ld)  # (3, vp3_nk*C, 3C)
        self.wrp = np.stack(wrps).astype(ld)  # (3, wrp_nk*R, 4R)
        self.wip = np.stack(wips).astype(ld)  # (3, wip_nk*R, 4R)
        self.vip = np.stack(vips).astype(ld)  # (3, vip_nk*C, 4C)
        self.g = np.stack(gs)  # (3, C, R) u32
        self.gs = np.stack(gss)
        self.gi = np.stack(gis)
        self.gis = np.stack(giss)


def _split_list(x, nplanes=4):
    """i32 -> balanced base-256 digit planes (i32, |d| <= 128).
    nplanes=4 covers |x| < 2^31; nplanes=3 covers |x| <= 2^23."""
    ds = []
    v = x
    h, m8, s8 = np.int32(128), np.int32(255), np.int32(8)
    for _ in range(nplanes - 1):
        d = ((v + h) & m8) - h
        ds.append(d)
        v = (v - d) >> s8
    ds.append(v)
    return ds


def _center_split(y_u32, ctx, na):
    """u32 residues in [0, 2p) -> list of na balanced digit planes (i32).
    na=3 centers to [-p/2, p/2] first (three planes hold |x| <= 2^23,
    needs p <= 16580352 -- the 2^24-class prime sets); na=4 splits the
    raw value (< 2^31). ~4 extra VPU ops/pt for na=3, repaid many times
    over by the dropped 4th table plane in every stage matmul."""
    if na == 4:
        return _split_list(y_u32.astype(I32), 4)
    c = _condsub(y_u32, ctx.pu).astype(I32)
    half = np.int32(ctx.p // 2)
    c = c - jnp.where(c > half, np.int32(ctx.p), np.int32(0))
    return _split_list(c, 3)


def _recombine(blk, ctx, big, nb=4, na=4):
    """blk(a, b) -> 2D i32 block slices; returns their weighted mod-p sum
    (same math as FoldedNtt._recombine, incl. the big-K S_3 split for
    na=nb=4; 3-plane sides pair-combine safely at any K <= 128)."""
    split3 = big and nb == 4 and na == 4
    s = [None] * (na + nb - 1)
    for a in range(na):
        for bb in range(nb):
            if split3 and a + bb == 3:
                continue
            k = a + bb
            t = blk(a, bb)
            s[k] = t if s[k] is None else s[k] + t
    e8 = np.int32(8)
    if split3:
        s[3] = blk(0, 3) + blk(1, 2)
        s3b = blk(2, 1) + blk(3, 0)
        r1b = ctx.reduce_signed(s3b << e8, ctx.c16)
    else:
        r1b = None
    while len(s) < 8:
        s.append(None)
    consts = (ctx.one, ctx.c16, ctx.c32, ctx.c48)
    out = None
    for j in range(4):
        lo, hi = s[2 * j], s[2 * j + 1]
        if lo is None and hi is None:
            continue
        t = lo if hi is None else ((hi << e8) if lo is None else lo + (hi << e8))
        r = ctx.reduce_signed(t, consts[j])
        out = r if out is None else _condsub(out + r, ctx.two_p)
    if r1b is not None:
        out = _condsub(out + r1b, ctx.two_p)
    return out


def _recombine_packed(out, ctx, d, nk):
    """Packed-matmul recombination: `out` is (nk*d, X) i32 whose
    row-blocks are the cross-plane sums s_k already accumulated by the
    block-Toeplitz matmul. Returns (d, X) u32 in [0, 2p).

    nk = 5 (na=nb=3), 6 (na=4,nb=3), 7 (na=nb=4) or 8 (na=nb=4 with k=3
    split in two blocks: rows 3 and 4 hold the a-{0,1}/{2,3} halves)."""
    blk = lambda j: out[j * d:(j + 1) * d, :]
    if nk == 8:
        s = [blk(0), blk(1), blk(2), blk(3), blk(5), blk(6), blk(7)]
        s3b = blk(4)
    else:
        s = [blk(j) for j in range(nk)]
        s3b = None
    e8 = np.int32(8)
    consts = (ctx.one, ctx.c16, ctx.c32, ctx.c48)
    acc = None
    for j in range(4):
        lo = s[2 * j] if 2 * j < len(s) else None
        hi = s[2 * j + 1] if 2 * j + 1 < len(s) else None
        if lo is None and hi is None:
            continue
        t = lo if hi is None else ((hi << e8) if lo is None else lo + (hi << e8))
        r = ctx.reduce_signed(t, consts[j])
        acc = r if acc is None else _condsub(acc + r, ctx.two_p)
    if s3b is not None:
        acc = _condsub(acc + ctx.reduce_signed(s3b << e8, ctx.c16), ctx.two_p)
    return acc


def _acc_dtype(lhs):
    # int8 digit planes accumulate exactly in i32 on the MXU (products
    # <= 2^14, K <= 128 -> sums <= 2^21); bf16/f32 planes use f32
    return jnp.int32 if lhs.dtype == jnp.int8 else jnp.float32


def _dot(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(lhs),
    )


def _dot_nt(lhs, rhs):
    """lhs (M, K) @ rhs (N, K)^T: contraction on both minor dims."""
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (1,)), ((), ())),
        preferred_element_type=_acc_dtype(lhs),
    )




def fwd_prime(x_planes_rhs, i, v_tab, wr_tab, g_tab, gs_tab, ctx,
              cd, rd, tm, nb, big_c, big_r, n, na=4):
    """One prime's forward transform on kernel VALUES.

    x_planes_rhs: (C, nb*TM*R) limb-dtype stage-1 rhs (shared across
    primes). Returns (TM, N) u32 in [0, 2p), layout h = t*R + s.
    na = table/mid-value digit planes (3 for the 2^24-class primes)."""
    out1 = _dot(v_tab[i], x_planes_rhs)  # (na_a*C, nb*TM*R) f32
    b1 = out1.reshape(na, cd, nb, tm * rd).astype(I32)
    y = _recombine(lambda a, b: b1[a, :, b, :], ctx, big_c, nb, na)
    ym = y.reshape(cd, tm, rd)
    yt = shoup_mulmod(ym, g_tab[i][:, None, :], gs_tab[i][:, None, :], ctx.pu)
    ds2 = _center_split(yt, ctx, na)
    rhs2 = jnp.stack(ds2, axis=0).reshape(na * cd * tm, rd)
    rhs2 = rhs2.astype(wr_tab.dtype)
    out2 = _dot_nt(wr_tab[i], rhs2)  # (na_a*R_s, na_b*C*TM)
    b2 = out2.reshape(na, rd, na, cd * tm).astype(I32)
    z = _recombine(lambda a, b: b2[a, :, b, :], ctx, big_r, na, na)
    zt = z.T.reshape(cd, tm, rd)  # (C_t, TM, R_s)
    return jnp.transpose(zt, (1, 0, 2)).reshape(tm, n)


def make_fwd_rhs(x_i32, cd, rd, tm, nb, ld):
    """(TM, N) i32 -> shared stage-1 rhs (C, nb*TM*R) limb planes."""
    xm = x_i32.reshape(tm, cd, rd)
    ds = _split_list(xm, nb)
    rhs1 = jnp.stack(ds, axis=0)  # (nb, TM, C, R)
    return jnp.transpose(rhs1, (2, 0, 1, 3)).reshape(cd, nb * tm * rd).astype(ld)


def make_fwd_rhs_packed(x_i32, cd, rd, tm, nb, ld):
    """(TM, N) i32 -> packed stage-1 rhs (nb*C, TM*R): digit planes
    stacked along the CONTRACTION axis, row-block order (b, c) matching
    _stack_digits_packed's column blocks."""
    xm = x_i32.reshape(tm, cd, rd)
    ds = _split_list(xm, nb)
    rhs1 = jnp.stack(ds, axis=0)  # (nb, TM, C, R)
    return jnp.transpose(rhs1, (0, 2, 1, 3)).reshape(nb * cd, tm * rd).astype(ld)


def fwd_prime_packed(x_rhs_p, i, vp_tab, wrp_tab, g_tab, gs_tab, ctx,
                     cd, rd, tm, nk1, nk2, n, na=4):
    """Block-Toeplitz forward transform for one prime.

    x_rhs_p: (3C, TM*R) packed stage-1 rhs (shared across primes).
    Returns (TM, N) u32 in [0, 2p), layout h = t*R + s. Same math as
    fwd_prime with the cross-plane sums fused into the matmuls."""
    out1 = _dot(vp_tab[i], x_rhs_p)  # (nk1*C, TM*R)
    y = _recombine_packed(out1.astype(I32), ctx, cd, nk1)  # (C, TM*R)
    ym = y.reshape(cd, tm, rd)
    yt = shoup_mulmod(ym, g_tab[i][:, None, :], gs_tab[i][:, None, :], ctx.pu)
    ds2 = _center_split(yt, ctx, na)  # na x (C, TM, R)
    rhs2 = jnp.stack(ds2, axis=-2).reshape(cd * tm, na * rd)
    rhs2 = rhs2.astype(wrp_tab.dtype)
    out2 = _dot_nt(wrp_tab[i], rhs2)  # (nk2*R, C*TM)
    z = _recombine_packed(out2.astype(I32), ctx, rd, nk2)  # (R, C*TM)
    zt = z.T.reshape(cd, tm, rd)
    return jnp.transpose(zt, (1, 0, 2)).reshape(tm, n)


def inv_prime_packed(f_u32, i, wip_tab, vip_tab, gi_tab, gis_tab, ctx,
                     cd, rd, tm, nk1, nk2, n, ld, na=4):
    """Block-Toeplitz inverse for one prime: (TM, N) u32 in [0, 2p)
    (layout h = t*R + s) -> (TM, N) u32 canonical residues, natural
    order."""
    fm = f_u32.astype(U32).reshape(tm, cd, rd)
    ds = _center_split(fm, ctx, na)  # na x (TM, C, R)
    rhs1 = jnp.stack(ds, axis=-2).reshape(tm * cd, na * rd).astype(ld)
    out1 = _dot_nt(wip_tab[i], rhs1)  # (nk1*R, TM*C)
    u = _recombine_packed(out1.astype(I32), ctx, rd, nk1)  # (R, TM*C)
    um = u.T.reshape(tm, cd, rd)
    ut = shoup_mulmod(um, gi_tab[i][None, :, :], gis_tab[i][None, :, :], ctx.pu)
    ds2 = _center_split(ut, ctx, na)  # na x (TM, C, R)
    rhs2 = jnp.stack(ds2, axis=0)  # (na, TM, C, R)
    rhs2 = jnp.transpose(rhs2, (0, 2, 1, 3)).reshape(na * cd, tm * rd)
    rhs2 = rhs2.astype(vip_tab.dtype)
    out2 = _dot(vip_tab[i], rhs2)  # (nk2*C, TM*R)
    a_res = _recombine_packed(out2.astype(I32), ctx, cd, nk2)
    a_res = _condsub(a_res, ctx.pu)
    am = a_res.reshape(cd, tm, rd)
    return jnp.transpose(am, (1, 0, 2)).reshape(tm, n)


def inv_prime(f_u32, i, wi_tab, vi_tab, gi_tab, gis_tab, ctx,
              cd, rd, tm, big_c, big_r, n, ld, na=4):
    """One prime's inverse on kernel VALUES: (TM, N) u32 in [0, 2p)
    (layout h = t*R + s) -> (TM, N) u32 canonical residues, natural
    order."""
    fm = f_u32.astype(U32).reshape(tm, cd, rd)  # (TM, C_t, R_s)
    ds = _center_split(fm, ctx, na)
    rhs1 = jnp.stack(ds, axis=0).reshape(na * tm * cd, rd).astype(ld)
    out1 = _dot_nt(wi_tab[i], rhs1)  # (na_a*R_r, na_b*TM*C)
    b1 = out1.reshape(na, rd, na, tm * cd).astype(I32)
    u = _recombine(lambda a, b: b1[a, :, b, :], ctx, big_r, na, na)
    um = u.T.reshape(tm, cd, rd)
    ut = shoup_mulmod(um, gi_tab[i][None, :, :], gis_tab[i][None, :, :], ctx.pu)
    ds2 = _center_split(ut, ctx, na)
    rhs2 = jnp.stack(ds2, axis=0)  # (na_b, TM, C, R)
    rhs2 = jnp.transpose(rhs2, (2, 0, 1, 3)).reshape(cd, na * tm * rd)
    rhs2 = rhs2.astype(vi_tab.dtype)
    out2 = _dot(vi_tab[i], rhs2)  # (na_a*C_c, na_b*TM*R)
    b2 = out2.reshape(na, cd, na, tm * rd).astype(I32)
    a_res = _recombine(lambda a, b: b2[a, :, b, :], ctx, big_c, na, na)
    a_res = _condsub(a_res, ctx.pu)
    am = a_res.reshape(cd, tm, rd)
    return jnp.transpose(am, (1, 0, 2)).reshape(tm, n)


def make_pallas_ntt(engine: FoldedCrtEngine, tm: int | None = None, nb: int = 4):
    """Build (forward, inverse) fused transforms for `engine`.

    forward(x): (..., N) i32 (|x| < 2^31) -> (..., P, N) u32 in [0, 2p)
    inverse(f): (..., P, N) u32 (< 2^31)  -> (..., P, N) u32 canonical
    Both match FoldedNtt mod p (tests/test_pallas_ntt.py).
    """
    tables = PallasNttTables(engine)
    n = engine.n
    n_pr = engine.n_primes
    rd, cd = tables.r_dim, tables.c_dim
    ctxs = [ntt.ctx for ntt in engine.ntts]
    big_r = rd > 64
    big_c = cd > 64
    if tm is None:
        tm = max(16, 128 // cd)  # stage-2 block views need cd*tm % 128 == 0
    ld = _limb_dtype()

    na = tables.na

    def fwd_kernel(x_ref, v_ref, wr_ref, g_ref, gs_ref, o_ref):
        rhs1 = make_fwd_rhs(x_ref[:], cd, rd, tm, nb, ld)
        for i in range(n_pr):
            o_ref[:, i, :] = fwd_prime(
                rhs1, i, v_ref, wr_ref, g_ref, gs_ref, ctxs[i],
                cd, rd, tm, nb, big_c, big_r, n, na,
            )

    def inv_kernel(f_ref, wi_ref, vi_ref, gi_ref, gis_ref, o_ref):
        for i in range(n_pr):
            o_ref[:, i, :] = inv_prime(
                f_ref[:, i, :], i, wi_ref, vi_ref, gi_ref,
                gis_ref, ctxs[i], cd, rd, tm, big_c, big_r, n, ld, na,
            )

    interpret = jax.default_backend() != "tpu"

    def _pad(x, m):
        pad = (-m) % tm
        if pad:
            cfg = [(0, 0)] * x.ndim
            cfg[0] = (0, pad)
            x = jnp.pad(x, cfg)
        return x, pad

    def forward(x: jax.Array) -> jax.Array:
        batch = x.shape[:-1]
        m = int(np.prod(batch)) if batch else 1
        xf = x.reshape(m, n).astype(I32)
        xf, pad = _pad(xf, m)
        mt = xf.shape[0]
        out = pl.pallas_call(
            fwd_kernel,
            grid=(mt // tm,),
            in_specs=[
                pl.BlockSpec((tm, n), lambda i: (i, _Z)),
                pl.BlockSpec(tables.v.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.wr.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.g.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.gs.shape, lambda i: (_Z, _Z, _Z)),
            ],
            out_specs=pl.BlockSpec((tm, n_pr, n), lambda i: (i, _Z, _Z)),
            out_shape=jax.ShapeDtypeStruct((mt, n_pr, n), U32),
            interpret=interpret,
        )(xf, tables.v, tables.wr, tables.g, tables.gs)
        if pad:
            out = out[:m]
        return out.reshape(*batch, n_pr, n)

    def inverse(f: jax.Array) -> jax.Array:
        batch = f.shape[:-2]
        m = int(np.prod(batch)) if batch else 1
        ff = f.reshape(m, n_pr, n)
        ff, pad = _pad(ff, m)
        mt = ff.shape[0]
        out = pl.pallas_call(
            inv_kernel,
            grid=(mt // tm,),
            in_specs=[
                pl.BlockSpec((tm, n_pr, n), lambda i: (i, _Z, _Z)),
                pl.BlockSpec(tables.wi.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.vi.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.gi.shape, lambda i: (_Z, _Z, _Z)),
                pl.BlockSpec(tables.gis.shape, lambda i: (_Z, _Z, _Z)),
            ],
            out_specs=pl.BlockSpec((tm, n_pr, n), lambda i: (i, _Z, _Z)),
            out_shape=jax.ShapeDtypeStruct((mt, n_pr, n), U32),
            interpret=interpret,
        )(ff, tables.wi, tables.vi, tables.gi, tables.gis)
        if pad:
            out = out[:m]
        return out.reshape(*batch, n_pr, n)

    return forward, inverse
