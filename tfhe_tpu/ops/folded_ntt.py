"""Folded four-step negacyclic NTT: the TPU-native exact polymul engine.

Replaces NegacyclicEngine (ops/polynomial.py) on the hot paths. Same CRT
contract -- exact negacyclic products mod 2^64 of (small poly) x (u64 torus
poly) via 3 NTT-friendly primes -- but engineered against the measured chip
profile (PERF_NOTES.md):

  * u64 modular arithmetic runs at 1.5 G/s on TPU (emulated long division);
    u32 runs ~100x faster and the MXU ~50x faster still. This engine does
    ZERO u64 `%` anywhere: all modular arithmetic is u32 Shoup/Barrett
    (each ~20 VPU ops) and all bulk multiplication is bf16 limb matmuls.
  * "Folded": with the index split i = r + R*c, j = C*s + t (N = R*C),
    the negacyclic twist psi^i and ALL mid twiddles fold into the two
    constant DFT matrices

        ahat[C*s+t] = sum_r M_t[s,r] * (sum_c V[t,c] * a[r+R*c])
        V[t,c]   = w_C^{ct} * psi^{R*c}            (shared C x C)
        M_t[s,r] = w_R^{rs} * w^{rt} * psi^{r}     (C batched R x R)

    (w = psi^2 the N-th root, w_R = w^C, w_C = w^R), so there are no
    elementwise twiddle multiplies at all. The inverse is symmetric with
    psi^{-r}, psi^{-R*c} and 1/N folded in.
  * Matrix entries and operands are split into 4 *balanced* base-256
    digits (|d| <= 128, exact in bf16); stage dot products accumulate
    exactly in f32 (< 2^21 << 2^24). Between stages the 4x4 digit blocks
    are recombined mod p with ~4 Shoup multiplications per point.

Primes: sub-2^30 (so lazy [0, 2p) residues and their pairwise sums stay
inside u32), 2^13 | p-1 for negacyclic transforms up to N = 4096.
Signed CRT range ~2^87: covers N * |a| * |b| up to 2^77 needed by
44-bit-stored bootstrap keys x 23-bit gadget digits at N = 2048.

Reference equivalence: tfhe-rs `polynomial_wrapping_mul` semantics
(consumed at ml/extensions/rust/src/computations.rs:50-107); the f64 FFT
inside tfhe-rs fft_impl is replaced by this exact integer engine.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.ops.polynomial import _is_prime, _primitive_root

U32 = jnp.uint32
U64 = jnp.uint64
I32 = jnp.int32

# ascending, all < 2^30, ord_2(p-1) >= 13 (negacyclic N up to 4096);
# 469762049 = 7*2^26+1, 754974721 = 45*2^24+1, 998244353 = 119*2^23+1
FOLDED_PRIMES = (469762049, 754974721, 998244353)


# ---------------------------------------------------------------------------
# u32 modular primitives (no u64 anywhere)
# ---------------------------------------------------------------------------


_NP0 = np.uint32(0)
_NP16 = np.uint32(16)
_NPFFFF = np.uint32(0xFFFF)


def _mulhi_u32(a: jax.Array, b) -> jax.Array:
    """High 32 bits of the 64-bit product of u32 operands (u32 ops only).

    Scalar constants are numpy scalars (trace-time literals), so this is
    safe inside Pallas kernels (no captured device constants)."""
    a0 = a & _NPFFFF
    a1 = a >> _NP16
    b0 = b & _NPFFFF
    b1 = b >> _NP16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    t = (ll >> _NP16) + (lh & _NPFFFF) + (hl & _NPFFFF)
    return a1 * b1 + (lh >> _NP16) + (hl >> _NP16) + (t >> _NP16)


def shoup_mulmod(a: jax.Array, w, w_shoup, p) -> jax.Array:
    """a * w mod p for ANY u32 a, fixed w < p with w_shoup = floor(w*2^32/p).

    Returns a lazy residue in [0, 2p). ~20 u32 VPU ops; the u64 equivalent
    XLA emits for `(a*w) % p` costs ~100x more (PERF_NOTES.md)."""
    q = _mulhi_u32(a, w_shoup)
    return a * w - q * p


def _condsub(x: jax.Array, m) -> jax.Array:
    return x - jnp.where(x >= m, m, _NP0)


class _PrimeCtx:
    """Per-prime constants for Shoup/Barrett arithmetic (numpy scalars:
    they embed as literals inside jit AND Pallas kernels)."""

    def __init__(self, p: int):
        self.p = p
        self.pu = np.uint32(p)
        self.two_p = np.uint32(2 * p)

        def pair(w: int):
            w %= p
            return (
                np.uint32(w),
                np.uint32((w << 32) // p),
                np.uint32((1 << 32) * w % p),
            )

        # (w, w_shoup, neg-correction 2^32*w mod p)
        self.one = pair(1)  # Barrett reduction of a < 2^32
        self.c16 = pair(1 << 16)
        self.c32 = pair(1 << 32)
        self.c48 = pair(1 << 48)

    def reduce_signed(self, t: jax.Array, c) -> jax.Array:
        """(i32 t) * c.w mod p -> [0, 2p), c = (w, w_shoup, corr).

        Uses an APPROXIMATE mulhi (the low-low partial product is
        dropped, so the Shoup quotient may be one short and the residue
        lands in [0, 3p)); with p < 2^30 the negative-input fix (p-corr)
        keeps the sum below 4p and a single conditional subtract restores
        [0, 2p). Saves one multiply + two shifts per point on the hottest
        VPU path (the digit-block recombination)."""
        w, ws, corr = c
        a = t.astype(U32)  # two's complement: represents t + 2^32*[t<0]
        a0 = a & _NPFFFF
        a1 = a >> _NP16
        b0 = ws & _NPFFFF
        b1 = ws >> _NP16
        lh = a0 * b1
        hl = a1 * b0
        tt = (lh & _NPFFFF) + (hl & _NPFFFF)
        q = a1 * b1 + (lh >> _NP16) + (hl >> _NP16) + (tt >> _NP16)
        r = a * w - q * self.pu  # in [0, 3p)
        fix = jnp.where(t < 0, np.uint32(self.p - int(corr) % self.p), _NP0)
        return _condsub(r + fix, self.two_p)

    def reduce_signed_arr(self, t: jax.Array, w, ws, fixv) -> jax.Array:
        """reduce_signed with ARRAY constants (w, ws, fixv broadcastable
        to t): used when a per-point twiddle twist is folded into the
        digit-recombination constant, eliminating the separate Shoup
        twist multiply (w = 2^{16j} * G[t,r] mod p,
        fixv = (p - 2^32*w) mod p, both precomputed host-side)."""
        a = t.astype(U32)
        a0 = a & _NPFFFF
        a1 = a >> _NP16
        b0 = ws & _NPFFFF
        b1 = ws >> _NP16
        lh = a0 * b1
        hl = a1 * b0
        tt = (lh & _NPFFFF) + (hl & _NPFFFF)
        q = a1 * b1 + (lh >> _NP16) + (hl >> _NP16) + (tt >> _NP16)
        r = a * w - q * self.pu  # in [0, 3p)
        fix = jnp.where(t < 0, fixv, _NP0)
        return _condsub(r + fix, self.two_p)

    def reduce_u64_pair(self, lo: jax.Array, hi: jax.Array) -> jax.Array:
        """(lo + 2^32*hi) mod p -> [0, 2p), u32 inputs."""
        w, ws, _ = self.one
        r0 = shoup_mulmod(lo, w, ws, self.pu)
        w2, ws2, _ = self.c32
        r1 = shoup_mulmod(hi, w2, ws2, self.pu)
        return _condsub(r0 + r1, self.two_p)


def _limb_dtype():
    """bf16 on TPU (MXU-native, digits |d| <= 128 are exact); f32 on CPU
    (the CPU DotThunk lacks BF16xBF16=F32)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _split_signed_i32(x: jax.Array, nplanes: int = 4) -> jax.Array:
    """Balanced base-256 digit split: i32 -> (..., nplanes) limb digits
    with |d| <= 128 and sum(d_k * 256^k) == x exactly. nplanes=4 covers
    |x| < 2^31; nplanes=3 covers |x| <= 2^23 (gadget digits)."""
    ds = []
    v = x
    h, m8, s8 = np.int32(128), np.int32(255), np.int32(8)
    for _ in range(nplanes - 1):
        d = ((v + h) & m8) - h
        ds.append(d)
        v = (v - d) >> s8  # exact: v - d is a multiple of 256
    ds.append(v)
    return jnp.stack(ds, axis=-1).astype(_limb_dtype())


def _split4_signed_i32(x: jax.Array) -> jax.Array:
    return _split_signed_i32(x, 4)


def _balanced_digits_host(m: np.ndarray, p: int) -> np.ndarray:
    """Matrix entries mod p -> centered then balanced base-256 digits.
    m: (..., ) uint64 in [0, p). Returns (..., 4) float32 with |d| <= 128."""
    v = m.astype(np.int64)
    v = np.where(v > p // 2, v - p, v)  # centered: |v| <= p/2 < 2^29
    out = np.empty(m.shape + (4,), dtype=np.int64)
    for k in range(3):
        d = ((v + 128) & 255) - 128
        out[..., k] = d
        v = (v - d) >> 8
    out[..., 3] = v
    assert np.abs(out).max() <= 128
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Per-prime folded four-step transform
# ---------------------------------------------------------------------------


def _factor(n: int) -> tuple[int, int]:
    """N = R*C, both powers of two. R = 128 where possible: the dominant
    stage-2 matmul then contracts a full 128-wide MXU tile AND the lane
    dim of every in-kernel view stays a 128-multiple (Mosaic requires it;
    see ops/pallas_ntt.py). Small test sizes fall back to near-square."""
    if n >= 256:
        return 128, n // 128
    r = 1
    while r * r < n:
        r *= 2
    return r, n // r


class FoldedNtt:
    """Negacyclic NTT mod a single prime; all twiddles folded into two
    constant bf16 digit-limb matrices (see module docstring)."""

    def __init__(self, p: int, n: int):
        assert _is_prime(p) and (p - 1) % (2 * n) == 0
        assert p < 2**30, "lazy [0,2p) residue arithmetic needs p < 2^30"
        self.p = p
        self.n = n
        self.ctx = _PrimeCtx(p)
        r, c = _factor(n)
        self.r_dim, self.c_dim = r, c
        # f32 accumulation exactness needs 128*128*K < 2^24 (K <= 1024);
        # the recombination's i32 headroom needs K <= 128 (big-K variant)
        assert max(r, c) <= 128, f"N={n} too large for the digit scheme"
        self._big_r = r > 64
        self._big_c = c > 64

        g = _primitive_root(p)
        psi = pow(g, (p - 1) // (2 * n), p)
        omega = psi * psi % p
        om_r = pow(omega, c, p)  # primitive R-th root
        om_c = pow(omega, r, p)  # primitive C-th root
        psi_inv = pow(psi, p - 2, p)
        om_inv = pow(omega, p - 2, p)
        om_r_inv = pow(om_r, p - 2, p)
        om_c_inv = pow(om_c, p - 2, p)
        n_inv = pow(n, p - 2, p)

        # forward stage 1: V[t, c'] = w_C^{c't} * psi^{R c'}
        v = np.empty((c, c), dtype=np.uint64)
        for t in range(c):
            for cc in range(c):
                v[t, cc] = pow(om_c, cc * t, p) * pow(psi, r * cc, p) % p
        # forward stage 2 (batched over t): M[t, s, r'] =
        #   w_R^{r's} * w^{r't} * psi^{r'}
        m = np.empty((c, r, r), dtype=np.uint64)
        for t in range(c):
            for s in range(r):
                for rr in range(r):
                    m[t, s, rr] = (
                        pow(om_r, rr * s, p)
                        * pow(omega, rr * t, p)
                        % p
                        * pow(psi, rr, p)
                        % p
                    )
        # inverse stage 1 (batched over t): Mi[t, r', s] =
        #   w_R^{-r's} * w^{-r't} * psi^{-r'} / N
        mi = np.empty((c, r, r), dtype=np.uint64)
        for t in range(c):
            for rr in range(r):
                fold = (
                    pow(om_inv, rr * t, p)
                    * pow(psi_inv, rr, p)
                    % p
                    * n_inv
                    % p
                )
                for s in range(r):
                    mi[t, rr, s] = pow(om_r_inv, rr * s, p) * fold % p
        # inverse stage 2: Vi[c', t] = w_C^{-c't} * psi^{-R c'}
        vi = np.empty((c, c), dtype=np.uint64)
        for cc in range(c):
            fold = pow(psi_inv, r * cc, p)
            for t in range(c):
                vi[cc, t] = pow(om_c_inv, cc * t, p) * fold % p

        as_limb = lambda x: jnp.asarray(x).astype(_limb_dtype())
        self.v_l = as_limb(_balanced_digits_host(v, p))  # (C, C, 4)
        self.m_l = as_limb(_balanced_digits_host(m, p))  # (C, R, R, 4)
        self.mi_l = as_limb(_balanced_digits_host(mi, p))  # (C, R, R, 4)
        self.vi_l = as_limb(_balanced_digits_host(vi, p))  # (C, C, 4)

    # -- digit-block recombination ------------------------------------------

    def _recombine(self, blocks: jax.Array, big: bool = False) -> jax.Array:
        """blocks: (..., 4a, D1, D2, 4b) f32/i32 exact digit-pair dot
        products; returns (..., D1, D2) u32 in [0, 2p) congruent to
        sum_{a,b} blocks * 256^(a+b).

        big=False: contraction K <= 64 (|block| <= 2^20): weight classes
        pair-combine into 2^16 limbs -> 4 Shoup reductions.
        big=True: K <= 128 (|block| <= 2^21): with nb=4 input planes S_3
        (four blocks) would overflow i32 when shifted, so it reduces in
        two halves (5 Shoup reductions); with nb=3 planes every class has
        <= 3 blocks and pair-combining is safe (3 reductions)."""
        b = blocks.astype(I32)
        nb = blocks.shape[-1]
        blk = lambda a, bb: b[..., a, :, :, bb]
        split3 = big and nb == 4
        s = [None] * (3 + nb)
        for a in range(4):
            for bb in range(nb):
                if split3 and a + bb == 3:
                    continue
                k = a + bb
                s[k] = blk(a, bb) if s[k] is None else s[k] + blk(a, bb)
        ctx = self.ctx
        e8 = np.int32(8)
        if split3:
            s3a = blk(0, 3) + blk(1, 2)  # <= 2^22 each half
            s3b = blk(2, 1) + blk(3, 0)
            s[3] = s3a
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
            t = lo if hi is None else (
                (hi << e8) if lo is None else lo + (hi << e8)
            )
            r = ctx.reduce_signed(t, consts[j])
            out = r if out is None else _condsub(out + r, ctx.two_p)
        if r1b is not None:
            out = _condsub(out + r1b, ctx.two_p)
        return out

    # -- transforms -----------------------------------------------------------

    def forward_planes(self, xl: jax.Array) -> jax.Array:
        """xl: (..., C, R, 4) bf16 balanced digit planes of the input
        arranged a[r + R*c] -> [..., c, r, digit]. Returns (..., N) u32
        NTT values in [0, 2p), folded layout h = t*R + s."""
        y = jnp.einsum(
            "tca,...crb->...atrb",
            self.v_l,
            xl,
            preferred_element_type=jnp.float32,
        )  # (..., 4a, C_t, R_r, 4b)
        y = self._recombine(y, big=self._big_c)  # (..., C, R) in [0, 2p)
        yl = _split4_signed_i32(y.astype(I32))  # (..., C, R, 4)
        z = jnp.einsum(
            "tsra,...trb->...atsb",
            self.m_l,
            yl,
            preferred_element_type=jnp.float32,
        )  # (..., 4a, C_t, R_s, 4b)
        out = self._recombine(z, big=self._big_r)  # (..., C_t, R_s)
        return out.reshape(*out.shape[:-2], self.n)

    def forward_signed(self, x: jax.Array) -> jax.Array:
        """x: (..., N) i32, |x| < 2^31. Returns (..., N) u32 in [0, 2p)."""
        xm = x.reshape(*x.shape[:-1], self.c_dim, self.r_dim)
        return self.forward_planes(_split4_signed_i32(xm))

    def inverse(self, f: jax.Array) -> jax.Array:
        """f: (..., N) u32 < 2^31 (lazy ok), folded layout. Returns
        (..., N) u32 residues in [0, p), natural coefficient order."""
        fm = f.reshape(*f.shape[:-1], self.c_dim, self.r_dim).astype(I32)
        fl = _split4_signed_i32(fm)  # (..., C_t, R_s, 4)
        u = jnp.einsum(
            "trsa,...tsb->...atrb",
            self.mi_l,
            fl,
            preferred_element_type=jnp.float32,
        )  # (..., 4a, C_t, R_r, 4b)
        u = self._recombine(u, big=self._big_r)  # (..., C_t, R_r)
        ul = _split4_signed_i32(u.astype(I32))
        a = jnp.einsum(
            "cta,...trb->...acrb",
            self.vi_l,
            ul,
            preferred_element_type=jnp.float32,
        )  # (..., 4a, C_c, R_r, 4b)
        a = self._recombine(a, big=self._big_c)  # (..., C, R)
        a = _condsub(a, self.ctx.pu)  # canonical [0, p)
        return a.reshape(*a.shape[:-2], self.n)


# ---------------------------------------------------------------------------
# CRT engine over three primes (NegacyclicEngine-compatible surface)
# ---------------------------------------------------------------------------


class FoldedCrtEngine:
    """Exact negacyclic polymul mod 2^64 over FOLDED_PRIMES.

    Drop-in upgrade of ops.polynomial.NegacyclicEngine for the hot paths:
    same forward/pointwise/backward contract (NTT-domain tensors are
    (..., n_primes, N) u32, lazily reduced to [0, 2p_i)), plus Shoup key
    transforms (`make_shoup`, `pointwise_shoup`) so fixed operands
    (bootstrap keys, secret keys, model weights) multiply at u32 speed.
    """

    def __init__(self, n: int, primes: Sequence[int] = FOLDED_PRIMES):
        assert n & (n - 1) == 0
        assert len(primes) == 3
        self.n = n
        self.primes = tuple(primes)
        self.ntts = [FoldedNtt(p, n) for p in self.primes]
        self.ntt_impl = "folded"
        p1, p2, p3 = self.primes
        prod = p1 * p2 * p3
        self.max_product_bits = int(np.floor(np.log2(prod / 2) - np.log2(n)))
        # Garner constants (u32 Shoup pairs)
        self._g_inv_p1_p2 = self._pair(pow(p1, p2 - 2, p2), p2)
        self._g_p1_mod_p3 = self._pair(p1 % p3, p3)
        self._g_inv_p1p2_p3 = self._pair(pow(p1 * p2 % p3, p3 - 2, p3), p3)
        self._p1_u64 = U64(p1)
        self._p2_u64 = U64(p2)
        self._prod_mod64 = U64(prod % 2**64)
        half = prod // 2
        self._h3 = U32(half // (p1 * p2))
        self._h2 = U32(half % (p1 * p2) // p1)
        self._h1 = U32(half % p1)
        # Fused Pallas kernels carry the PBS hot path on TPU (forward of
        # gadget digits + inverse): they keep the 16x digit-block f32
        # intermediates in VMEM, where the XLA path is HBM-bound on them.
        # N >= 256 keeps R = 128: every kernel-internal reshape then has a
        # 128-multiple minor dim (Mosaic requirement, ops/pallas_ntt.py).
        # TFHE_TPU_NO_PALLAS=1 forces the pure-XLA path (debugging).
        import os

        self.use_pallas = (
            jax.default_backend() == "tpu"
            and n >= 256
            and not os.environ.get("TFHE_TPU_NO_PALLAS")
        )
        self._pallas_fwd = None
        self._pallas_inv = None
        if self.use_pallas:
            from tfhe_tpu.ops.pallas_ntt import make_pallas_ntt

            # nb=3 digit planes: matches forward_small's |a| <= 2^23 contract
            self._pallas_fwd, self._pallas_inv = make_pallas_ntt(self, nb=3)
        self.forward_small = jax.jit(self.forward_small)
        self.forward_u64 = jax.jit(self.forward_u64)
        self.backward = jax.jit(self.backward, static_argnames=("shift",))
        self.make_shoup = jax.jit(self.make_shoup)

    @staticmethod
    def _pair(w: int, p: int):
        # numpy scalars: usable as literals inside Pallas kernels
        return (np.uint32(w), np.uint32((w << 32) // p), p)

    # -- forward --------------------------------------------------------------

    def forward_small(self, a: jax.Array) -> jax.Array:
        """Small signed polynomials (|a| <= 2^23: gadget digits for
        base_log <= 24, secrets, quantized weights): (..., N) int ->
        (..., P, N) u32 in [0, 2p_i). Three digit planes suffice at this
        magnitude (25% less stage work than the generic 4-plane path);
        the split is shared across primes."""
        if a.dtype in (jnp.uint64, jnp.int64):
            a = a.astype(jnp.int64).astype(I32)
        else:
            a = a.astype(I32)
        if self._pallas_fwd is not None:
            return self._pallas_fwd(a)
        am = a.reshape(*a.shape[:-1], self.ntts[0].c_dim, self.ntts[0].r_dim)
        planes = _split_signed_i32(am, 3)
        return jnp.stack(
            [ntt.forward_planes(planes) for ntt in self.ntts], axis=-2
        )

    def forward_u64(self, b: jax.Array) -> jax.Array:
        """u64 torus polynomials: (..., N) u64 -> (..., P, N) u32.
        Residues computed from the (lo, hi) u32 planes -- no u64 `%`."""
        lo = (b & U64(0xFFFFFFFF)).astype(U32)
        hi = (b >> U64(32)).astype(U32)
        outs = []
        for ntt in self.ntts:
            r = ntt.ctx.reduce_u64_pair(lo, hi)  # [0, 2p) < 2^31
            outs.append(ntt.forward_signed(r.astype(I32)))
        return jnp.stack(outs, axis=-2)

    def make_shoup(self, f: jax.Array) -> jax.Array:
        """Precompute Shoup companions for a fixed NTT-domain tensor
        (key material): (..., P, N) u32 -> (..., P, 2, N) u32 stacking
        (canonical value, floor(value*2^32/p))."""
        vals = []
        shoups = []
        for i, ntt in enumerate(self.ntts):
            v = _condsub(f[..., i, :], ntt.ctx.pu)  # canonical [0, p)
            vals.append(v)
            s = ((v.astype(U64) << U64(32)) // U64(ntt.p)).astype(U32)
            shoups.append(s)
        return jnp.stack(
            [jnp.stack(vals, axis=-2), jnp.stack(shoups, axis=-2)], axis=-2
        )  # (..., P, 2, N)

    # -- transform-domain algebra ----------------------------------------------

    def pointwise_shoup(self, fa: jax.Array, key: jax.Array) -> jax.Array:
        """fa: (..., P, N) u32 (any u32); key: (..., P, 2, N) from
        make_shoup. Returns (..., P, N) u32 in [0, 2p_i)."""
        outs = []
        for i, ntt in enumerate(self.ntts):
            outs.append(
                shoup_mulmod(
                    fa[..., i, :],
                    key[..., i, 0, :],
                    key[..., i, 1, :],
                    ntt.ctx.pu,
                )
            )
        return jnp.stack(outs, axis=-2)

    def pointwise_mul(self, fa: jax.Array, fb: jax.Array) -> jax.Array:
        """Generic mulmod (neither operand precomputed): full 64-bit
        product via u32 splits, then Barrett. (..., P, N) x2 -> same."""
        outs = []
        for i, ntt in enumerate(self.ntts):
            a = _condsub(fa[..., i, :], ntt.ctx.pu)
            b = _condsub(fb[..., i, :], ntt.ctx.pu)
            lo = a * b
            hi = _mulhi_u32(a, b)
            outs.append(ntt.ctx.reduce_u64_pair(lo, hi))
        return jnp.stack(outs, axis=-2)

    def add_domain(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Lazy addmod of [0, 2p) residues -> [0, 2p)."""
        outs = []
        for i, ntt in enumerate(self.ntts):
            outs.append(_condsub(x[..., i, :] + y[..., i, :], ntt.ctx.two_p))
        return jnp.stack(outs, axis=-2)

    def condsub_domain(self, x: jax.Array) -> jax.Array:
        """One conditional subtract of 2p per prime: [0, 4p) -> [0, 2p)."""
        outs = []
        for i, ntt in enumerate(self.ntts):
            outs.append(_condsub(x[..., i, :], ntt.ctx.two_p))
        return jnp.stack(outs, axis=-2)

    def reduce_u64_domain(
        self, s: jax.Array, canonical: bool = False
    ) -> jax.Array:
        """Reduce unreduced u64 accumulations (sums of [0, 2p) products)
        back to residues: (..., P, N) u64 -> u32 in [0, 2p), or [0, p)
        with canonical=True. u32 Shoup on the (lo, hi) planes."""
        lo = (s & U64(0xFFFFFFFF)).astype(U32)
        hi = (s >> U64(32)).astype(U32)
        outs = []
        for i, ntt in enumerate(self.ntts):
            r = ntt.ctx.reduce_u64_pair(lo[..., i, :], hi[..., i, :])
            if canonical:
                r = _condsub(r, ntt.ctx.pu)
            outs.append(r)
        return jnp.stack(outs, axis=-2)

    # -- inverse + CRT ----------------------------------------------------------

    def crt_reconstruct(self, r: list) -> jax.Array:
        """Garner: per-prime u32 residues (canonical [0, p_i)) -> exact
        signed value mod 2^64 (u64). u32 Shoup throughout; the only u64
        ops are two multiplies and adds for the final Horner form."""
        r1, r2, r3 = r
        c1, c2, c3 = (ntt.ctx for ntt in self.ntts)
        v1 = r1
        w, ws, _ = self._g_inv_p1_p2
        d = r2 + c2.two_p - v1  # v1 < p1 < 2*p2: positive, < 3*p2 < 2^32
        v2 = _condsub(shoup_mulmod(d, w, ws, c2.pu), c2.pu)  # [0, p2)
        w, ws, _ = self._g_p1_mod_p3
        lo3 = shoup_mulmod(v2, w, ws, c3.pu) + v1  # < 2p3 + p1 < 3p3
        lo3 = _condsub(lo3, c3.two_p)  # < 2*p3
        w, ws, _ = self._g_inv_p1p2_p3
        d3 = r3 + c3.two_p - lo3  # positive, < 3*p3 < 2^32
        v3 = _condsub(shoup_mulmod(d3, w, ws, c3.pu), c3.pu)  # [0, p3)
        x = v1.astype(U64) + self._p1_u64 * (
            v2.astype(U64) + self._p2_u64 * v3.astype(U64)
        )
        neg = (v3 > self._h3) | (
            (v3 == self._h3)
            & ((v2 > self._h2) | ((v2 == self._h2) & (v1 > self._h1)))
        )
        return x - jnp.where(neg, self._prod_mod64, U64(0))

    def backward(self, f: jax.Array, shift: int = 0) -> jax.Array:
        """(..., P, N) u32 (values < 2^31) -> (..., N) u64 coefficients."""
        if self._pallas_inv is not None:
            res = self._pallas_inv(f)
            r = [res[..., i, :] for i in range(3)]
        else:
            r = [ntt.inverse(f[..., i, :]) for i, ntt in enumerate(self.ntts)]
        x = self.crt_reconstruct(r)
        if shift:
            x = x << U64(shift)
        return x

    # -- convenience -------------------------------------------------------------

    def polymul(self, a_small: jax.Array, b_u64: jax.Array) -> jax.Array:
        fa = self.forward_small(a_small)
        fb = self.forward_u64(b_u64)
        return self.backward(self.pointwise_mul(fa, fb))


@functools.lru_cache(maxsize=None)
def get_folded_engine(
    n: int, primes: Sequence[int] = FOLDED_PRIMES
) -> FoldedCrtEngine:
    # Concrete table values even when the first construction happens
    # inside a jit trace (the engine is cached; tracer-valued tables
    # would poison every later program -- see polynomial.get_engine).
    with jax.ensure_compile_time_eval():
        return FoldedCrtEngine(n, primes)
