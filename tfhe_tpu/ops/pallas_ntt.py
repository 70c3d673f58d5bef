"""Pallas TPU kernels for the folded CRT-NTT.

Fuses each direction of the 3-prime folded four-step NTT
(ops/folded_ntt.py) into ONE kernel so the 16x digit-block f32
intermediates never touch HBM — on the measured chip profile
(PERF_NOTES.md) the XLA path is HBM-bound on exactly those tensors.

Math identical to FoldedNtt, with the per-output-batch twiddles pulled
out of the batched stage-2 matrices so both DFT stages are single
*shared* MXU matmuls plus one elementwise Shoup multiply:

    forward:  y[t,r]  = sum_c V[t,c] * x[r + R*c]       (shared matmul)
              y'[t,r] = y[t,r] * G[t,r]                  (Shoup; G=(w^t psi)^r)
              out[t*R+s] = sum_r W_R[s,r] * y'[t,r]      (shared matmul)
    inverse:  U[t,r]  = Gi[t,r] * sum_s Wi_R[r,s] f[t*R+s]   (Gi=(w^-t psi^-1)^r / N)
              a[r+R*c] = sum_t Vi[c,t] * U[t,r]

Matrix entries ride as balanced base-256 digit limbs (|d| <= 128, exact
bf16 / f32-accumulated); between-stage values recombine mod p in u32
Shoup arithmetic inside VMEM. The kernel reproduces FoldedNtt's output
layout (h = t*R + s) bit-for-bit, so keys prepared by the XLA engine are
directly consumable.

Replaces what the reference delegates to tfhe-rs' f64 FFT
(ml/extensions/rust/src/compression.rs:6 fft_impl import); this is the
framework's hottest kernel (every PBS step runs 12 of these transforms).
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
    _balanced_digits_host,
    _condsub,
    _limb_dtype,
    _split4_signed_i32,
    shoup_mulmod,
)
from tfhe_tpu.ops.polynomial import _primitive_root

U32 = jnp.uint32
I32 = jnp.int32


def _stack_digits(m: np.ndarray, p: int) -> np.ndarray:
    """(D1, D2) matrix mod p -> (4*D1, D2) stacked balanced digit planes
    (row a*D1 + i is digit a of row i)."""
    d = _balanced_digits_host(m, p)  # (D1, D2, 4)
    return np.concatenate([d[..., a] for a in range(4)], axis=0)


class PallasNttTables:
    """Per-engine constant tables for the fused kernels (stacked over the
    3 primes on a leading axis)."""

    def __init__(self, engine: FoldedCrtEngine):
        self.engine = engine
        n = engine.n
        ntt0 = engine.ntts[0]
        r_dim, c_dim = ntt0.r_dim, ntt0.c_dim
        self.n, self.r_dim, self.c_dim = n, r_dim, c_dim
        vs, wrs, gs, gss = [], [], [], []
        wis, vis, gis, giss = [], [], [], []
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
            # forward stage 1: V[t, c] = w_C^{ct} * psi^{R c}  (== FoldedNtt)
            v = np.empty((c_dim, c_dim), dtype=np.uint64)
            for t in range(c_dim):
                for c in range(c_dim):
                    v[t, c] = pow(om_c, c * t, p) * pow(psi, r_dim * c, p) % p
            # forward stage 2 shared matrix: W_R[s, r] = w_R^{rs}
            wr = np.empty((r_dim, r_dim), dtype=np.uint64)
            for s in range(r_dim):
                for r in range(r_dim):
                    wr[s, r] = pow(om_r, r * s, p)
            # forward twiddle grid: G[t, r] = (w^t psi)^r
            gm = np.empty((c_dim, r_dim), dtype=np.uint64)
            for t in range(c_dim):
                base = pow(omega, t, p) * psi % p
                for r in range(r_dim):
                    gm[t, r] = pow(base, r, p)
            # inverse stage 1 shared matrix: Wi[r, s] = w_R^{-rs}
            wi = np.empty((r_dim, r_dim), dtype=np.uint64)
            for r in range(r_dim):
                for s in range(r_dim):
                    wi[r, s] = pow(om_r_inv, r * s, p)
            # inverse twiddle grid: Gi[t, r] = (w^-t psi^-1)^r / N
            gim = np.empty((c_dim, r_dim), dtype=np.uint64)
            for t in range(c_dim):
                base = pow(om_inv, t, p) * psi_inv % p
                for r in range(r_dim):
                    gim[t, r] = pow(base, r, p) * n_inv % p
            # inverse stage 2: Vi[c, t] = w_C^{-ct} * psi^{-R c}
            vi = np.empty((c_dim, c_dim), dtype=np.uint64)
            for c in range(c_dim):
                fold = pow(psi_inv, r_dim * c, p)
                for t in range(c_dim):
                    vi[c, t] = pow(om_c_inv, c * t, p) * fold % p
            vs.append(_stack_digits(v, p))
            wrs.append(_stack_digits(wr, p))
            wis.append(_stack_digits(wi, p))
            vis.append(_stack_digits(vi, p))
            gs.append(gm.astype(np.uint32))
            gss.append(((gm.astype(object) << 32) // p).astype(np.uint32))
            gis.append(gim.astype(np.uint32))
            giss.append(((gim.astype(object) << 32) // p).astype(np.uint32))
        ld = _limb_dtype()
        self.v = jnp.asarray(np.stack(vs)).astype(ld)  # (3, 4C, C)
        self.wr = jnp.asarray(np.stack(wrs)).astype(ld)  # (3, 4R, R)
        self.wi = jnp.asarray(np.stack(wis)).astype(ld)  # (3, 4R, R)
        self.vi = jnp.asarray(np.stack(vis)).astype(ld)  # (3, 4C, C)
        self.g = jnp.asarray(np.stack(gs))  # (3, C, R) u32
        self.gs = jnp.asarray(np.stack(gss))
        self.gi = jnp.asarray(np.stack(gis))
        self.gis = jnp.asarray(np.stack(giss))


def _recombine_pallas(blocks, ctx):
    """blocks: (4a, D1, D2, 4b) f32/i32 exact ints -> (D1, D2) u32 in
    [0, 2p). Same math as FoldedNtt._recombine (single leading a-axis)."""
    b = blocks.astype(I32)
    s = [None] * 7
    for a in range(4):
        for bb in range(4):
            k = a + bb
            blk = b[a, :, :, bb]
            s[k] = blk if s[k] is None else s[k] + blk
    t0 = s[0] + (s[1] << I32(8))
    t1 = s[2] + (s[3] << I32(8))
    t2 = s[4] + (s[5] << I32(8))
    t3 = s[6]
    r0 = ctx.reduce_signed(t0, ctx.one)
    r1 = ctx.reduce_signed(t1, ctx.c16)
    r2 = ctx.reduce_signed(t2, ctx.c32)
    r3 = ctx.reduce_signed(t3, ctx.c48)
    s01 = _condsub(r0 + r1, ctx.two_p)
    s23 = _condsub(r2 + r3, ctx.two_p)
    return _condsub(s01 + s23, ctx.two_p)


def _dot(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def make_pallas_ntt(engine: FoldedCrtEngine, tm: int = 16):
    """Build (forward, inverse) fused transforms for `engine`.

    forward(x): (..., N) i32 (|x| < 2^31) -> (..., P, N) u32 in [0, 2p)
    inverse(f): (..., P, N) u32 (< 2^31)  -> (..., P, N) u32 canonical
    Both match FoldedNtt's forward_signed / per-prime inverse outputs
    bit-for-bit (validated in tests/test_pallas_ntt.py).
    """
    tables = PallasNttTables(engine)
    n = engine.n
    r_dim, c_dim = tables.r_dim, tables.c_dim
    ctxs = [ntt.ctx for ntt in engine.ntts]

    def fwd_kernel(x_ref, v_ref, wr_ref, g_ref, gs_ref, o_ref):
        x = x_ref[:]  # (TM, N) i32
        xm = x.reshape(tm, c_dim, r_dim)  # lane split: i = r + R*c
        planes = _split4_signed_i32(xm)  # (TM, C, R, 4)
        # rhs for stage 1: (C, TM*4b*R)
        rhs1 = jnp.transpose(planes, (1, 0, 3, 2)).reshape(c_dim, -1)
        rhs1 = rhs1.astype(v_ref.dtype)
        for i in range(3):
            ctx = ctxs[i]
            out1 = _dot(v_ref[i], rhs1)  # (4a*C, TM*4b*R) f32
            blocks = out1.reshape(4, c_dim, tm, 4, r_dim)
            blocks = jnp.transpose(blocks, (0, 1, 2, 4, 3))  # (4a,C,TM,R,4b)
            y = _recombine_pallas(
                blocks.reshape(4, c_dim, tm * r_dim, 4), ctx
            ).reshape(c_dim, tm, r_dim)
            # twiddle: y' = y * G[t, r]
            yt = shoup_mulmod(
                y, g_ref[i][:, None, :], gs_ref[i][:, None, :], ctx.pu
            )  # (C, TM, R) in [0, 2p)
            yl = _split4_signed_i32(yt.astype(I32))  # (C, TM, R, 4)
            rhs2 = jnp.transpose(yl, (2, 0, 1, 3)).reshape(r_dim, -1)
            rhs2 = rhs2.astype(wr_ref.dtype)
            out2 = _dot(wr_ref[i], rhs2)  # (4a*R_s, C*TM*4b)
            blocks2 = out2.reshape(4, r_dim, c_dim, tm, 4)
            blocks2 = jnp.transpose(blocks2, (0, 2, 3, 1, 4))  # (4a,C,TM,R_s,4b)
            z = _recombine_pallas(
                blocks2.reshape(4, c_dim * tm, r_dim, 4), ctx
            ).reshape(c_dim, tm, r_dim)
            # layout h = t*R + s: (TM, C, R) -> (TM, N)
            o_ref[:, i, :] = jnp.transpose(z, (1, 0, 2)).reshape(tm, n)

    def inv_kernel(f_ref, wi_ref, vi_ref, gi_ref, gis_ref, o_ref):
        for i in range(3):
            ctx = ctxs[i]
            f = f_ref[:, i, :].astype(I32)  # (TM, N), h = t*R + s
            fm = f.reshape(tm, c_dim, r_dim)  # (TM, C_t, R_s)
            fl = _split4_signed_i32(fm)  # (TM, C, R_s, 4)
            rhs1 = jnp.transpose(fl, (2, 0, 1, 3)).reshape(r_dim, -1)
            rhs1 = rhs1.astype(wi_ref.dtype)
            out1 = _dot(wi_ref[i], rhs1)  # (4a*R_r, TM*C*4b)
            blocks = out1.reshape(4, r_dim, tm, c_dim, 4)
            blocks = jnp.transpose(blocks, (0, 3, 2, 1, 4))  # (4a,C,TM,R_r,4b)
            u = _recombine_pallas(
                blocks.reshape(4, c_dim, tm * r_dim, 4), ctx
            ).reshape(c_dim, tm, r_dim)
            ut = shoup_mulmod(
                u, gi_ref[i][:, None, :], gis_ref[i][:, None, :], ctx.pu
            )  # (C_t, TM, R_r)
            ul = _split4_signed_i32(ut.astype(I32))  # (C, TM, R, 4)
            rhs2 = jnp.transpose(ul, (0, 1, 3, 2)).reshape(c_dim, -1)
            rhs2 = rhs2.astype(vi_ref.dtype)
            out2 = _dot(vi_ref[i], rhs2)  # (4a*C_c, TM*4b*R)
            blocks2 = out2.reshape(4, c_dim, tm, 4, r_dim)
            blocks2 = jnp.transpose(blocks2, (0, 1, 2, 4, 3))
            a = _recombine_pallas(
                blocks2.reshape(4, c_dim, tm * r_dim, 4), ctx
            ).reshape(c_dim, tm, r_dim)
            a = _condsub(a, ctx.pu)  # canonical [0, p)
            # i = r + R*c: (TM, C_c, R) -> (TM, N)
            o_ref[:, i, :] = jnp.transpose(a, (1, 0, 2)).reshape(tm, n)

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
                pl.BlockSpec((tm, n), lambda i: (i, 0)),
                pl.BlockSpec(tables.v.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.wr.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.g.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.gs.shape, lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tm, 3, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((mt, 3, n), U32),
            interpret=interpret,
        )(xf, tables.v, tables.wr, tables.g, tables.gs)
        if pad:
            out = out[:m]
        return out.reshape(*batch, 3, n)

    def inverse(f: jax.Array) -> jax.Array:
        batch = f.shape[:-2]
        m = int(np.prod(batch)) if batch else 1
        ff = f.reshape(m, 3, n)
        ff, pad = _pad(ff, m)
        mt = ff.shape[0]
        out = pl.pallas_call(
            inv_kernel,
            grid=(mt // tm,),
            in_specs=[
                pl.BlockSpec((tm, 3, n), lambda i: (i, 0, 0)),
                pl.BlockSpec(tables.wi.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.vi.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.gi.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(tables.gis.shape, lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tm, 3, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((mt, 3, n), U32),
            interpret=interpret,
        )(ff, tables.wi, tables.vi, tables.gi, tables.gis)
        if pad:
            out = out[:m]
        return out.reshape(*batch, 3, n)

    return forward, inverse
