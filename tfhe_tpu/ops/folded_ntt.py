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

# 4x ~2^24 primes (ascending, = k*2^13+1, ord_2(p-1) >= 13): every
# transform operand fits THREE balanced base-256 digit planes instead of
# four -- centered residues |x| <= p/2 <= 8290176 keep the top digit
# <= 127 (int8-exact), so stage matmul cost drops ~37% and the packed
# recombiner runs nk=5 row blocks instead of 8 (PERF_NOTES.md round-4
# lever). CRT range 2^95.9 (> the 3-prime 2^88.2): key-storage msb
# IMPROVES. Costs one extra Garner limb (~3% of a PBS step).
FOLDED_PRIMES_4 = (16384001, 16465921, 16490497, 16515073)


def _resolve_default_primes() -> tuple:
    import os

    if os.environ.get("TFHE_TPU_PRIMES", "3") == "4":
        return FOLDED_PRIMES_4
    return FOLDED_PRIMES


# Resolved ONCE at import: the prime set is a process-level constant, so
# numerics can never silently change between two calls in one process.
# Tests/benches that want the other set pass `primes=` to the engine
# constructor (or set TFHE_TPU_PRIMES before the first tfhe_tpu import).
DEFAULT_PRIMES = _resolve_default_primes()


def default_primes() -> tuple:
    """The process-default engine prime set (see DEFAULT_PRIMES)."""
    return DEFAULT_PRIMES


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


def _balanced_digits_host(
    m: np.ndarray, p: int, nplanes: int = 4
) -> np.ndarray:
    """Matrix entries mod p -> centered then balanced base-256 digits.
    m: (..., ) uint64 in [0, p). Returns (..., nplanes) float32 with
    |d| <= 128 (nplanes=3 needs p/2 <= 8290176, i.e. the 2^24 sets)."""
    v = m.astype(np.int64)
    v = np.where(v > p // 2, v - p, v)  # centered: |v| <= p/2 < 2^29
    out = np.empty(m.shape + (nplanes,), dtype=np.int64)
    for k in range(nplanes - 1):
        d = ((v + 128) & 255) - 128
        out[..., k] = d
        v = (v - d) >> 8
    out[..., nplanes - 1] = v
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
        # table/mid-value digit planes: 3 when centered residues
        # |x| <= p/2 keep the top balanced digit <= 127 (int8/bf16
        # exact), else 4 (the sub-2^30 sets)
        self.na = 3 if p <= 16580352 else 4
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
        na = self.na
        self.v_l = as_limb(_balanced_digits_host(v, p, na))  # (C, C, na)
        self.m_l = as_limb(_balanced_digits_host(m, p, na))  # (C, R, R, na)
        self.mi_l = as_limb(_balanced_digits_host(mi, p, na))
        self.vi_l = as_limb(_balanced_digits_host(vi, p, na))  # (C, C, na)

    # -- digit-block recombination ------------------------------------------

    def _recombine(self, blocks: jax.Array, big: bool = False) -> jax.Array:
        """blocks: (..., na, D1, D2, nb) f32/i32 exact digit-pair dot
        products; returns (..., D1, D2) u32 in [0, 2p) congruent to
        sum_{a,b} blocks * 256^(a+b).

        big=False: contraction K <= 64 (|block| <= 2^20): weight classes
        pair-combine into 2^16 limbs -> <= 4 Shoup reductions.
        big=True: K <= 128 (|block| <= 2^21): with na=nb=4 planes S_3
        (four blocks) would overflow i32 when shifted, so it reduces in
        two halves (5 Shoup reductions); any 3-plane side caps every
        class at <= 3 blocks and pair-combining is safe."""
        b = blocks.astype(I32)
        na = blocks.shape[-4]
        nb = blocks.shape[-1]
        blk = lambda a, bb: b[..., a, :, :, bb]
        split3 = big and na == 4 and nb == 4
        s = [None] * (na + nb - 1)
        for a in range(na):
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

    # -- mid-stage digit planes ------------------------------------------------

    def _center_i32(self, r: jax.Array) -> jax.Array:
        """u32 residues in [0, 2p) -> centered i32 in [-p/2, p/2]."""
        c = _condsub(r, self.ctx.pu).astype(I32)
        halfp = np.int32(self.p // 2)
        return c - jnp.where(c > halfp, np.int32(self.p), np.int32(0))

    def _mid_planes(self, y: jax.Array) -> jax.Array:
        """Digit planes of a mid-stage residue tensor ([0, 2p) u32):
        na=3 centers first (top digit stays <= 127), na=4 splits raw."""
        if self.na == 3:
            return _split_signed_i32(self._center_i32(y), 3)
        return _split4_signed_i32(y.astype(I32))

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
        yl = self._mid_planes(y)  # (..., C, R, na)
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
        fm = f.reshape(*f.shape[:-1], self.c_dim, self.r_dim)
        if self.na == 3:
            fl = _split_signed_i32(self._center_i32(fm), 3)
        else:
            fl = _split4_signed_i32(fm.astype(I32))  # (..., C_t, R_s, 4)
        u = jnp.einsum(
            "trsa,...tsb->...atrb",
            self.mi_l,
            fl,
            preferred_element_type=jnp.float32,
        )  # (..., 4a, C_t, R_r, 4b)
        u = self._recombine(u, big=self._big_r)  # (..., C_t, R_r)
        ul = self._mid_planes(u)
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
# CRT engine over 3 or 4 primes (NegacyclicEngine-compatible surface)
# ---------------------------------------------------------------------------


class GarnerConsts:
    """Mixed-radix (Garner) constants for x = v0 + p0(v1 + p1(v2 + ...)),
    v_i in [0, p_i), as numpy u32 scalars (kernel-literal safe).

    Shared by the XLA crt_reconstruct and the fused Pallas kernels
    (ops/pallas_blind_rotate.garner_pair)."""

    def __init__(self, primes: Sequence[int]):
        self.primes = tuple(primes)
        self.np = len(primes)
        self.p_u32 = tuple(np.uint32(p) for p in primes)
        prod = 1
        for p in primes:
            prod *= p
        self.prod = prod
        self.prod_lo = np.uint32(prod % 2**64 & 0xFFFFFFFF)
        self.prod_hi = np.uint32((prod % 2**64) >> 32)

        def pair(w: int, p: int):
            w %= p
            return (np.uint32(w), np.uint32((w << 32) // p))

        # inv[i] = (prod_{j<i} p_j)^{-1} mod p_i; pmod[i][j] = p_j mod p_i
        self.inv: list = [None] * self.np
        self.pmod: list = [[None] * self.np for _ in range(self.np)]
        for i in range(1, self.np):
            pi = primes[i]
            prodi = 1
            for j in range(i):
                prodi *= primes[j]
            self.inv[i] = pair(pow(prodi % pi, pi - 2, pi), pi)
            for j in range(i):
                self.pmod[i][j] = pair(primes[j], pi)
        # mixed-radix digits of prod//2 (negative-range threshold)
        half = prod // 2
        hs = []
        t = half
        for p in primes:
            hs.append(np.uint32(t % p))
            t //= p
        self.h = tuple(hs)


class FoldedCrtEngine:
    """Exact negacyclic polymul mod 2^64 over a configurable CRT prime
    set (2-4 primes; FOLDED_PRIMES by default, FOLDED_PRIMES_4 for the
    4x ~2^24 three-digit-plane variant).

    Drop-in upgrade of ops.polynomial.NegacyclicEngine for the hot paths:
    same forward/pointwise/backward contract (NTT-domain tensors are
    (..., n_primes, N) u32, lazily reduced to [0, 2p_i)), plus Shoup key
    transforms (`make_shoup`, `pointwise_shoup`) so fixed operands
    (bootstrap keys, secret keys, model weights) multiply at u32 speed.
    """

    def __init__(self, n: int, primes: Sequence[int] | None = None):
        if primes is None:
            primes = default_primes()
        assert n & (n - 1) == 0
        assert 2 <= len(primes) <= 4
        # ascending: the generic Garner's lazy Horner bound then needs no
        # extra reductions (v_j < p_j < p_i for every j < i)
        assert tuple(primes) == tuple(sorted(primes))
        self.n = n
        self.primes = tuple(primes)
        self.n_primes = len(self.primes)
        self.ntts = [FoldedNtt(p, n) for p in self.primes]
        assert len({ntt.na for ntt in self.ntts}) == 1, "uniform planes"
        self.ntt_impl = "folded"
        prod = 1
        for p in self.primes:
            prod *= p
        self.max_product_bits = int(np.floor(np.log2(prod / 2) - np.log2(n)))
        self.garner = GarnerConsts(self.primes)
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
        ops are the final Horner multiplies/adds (which wrap mod 2^64 --
        exactly the modulus wanted)."""
        g = self.garner
        ctxs = [ntt.ctx for ntt in self.ntts]
        v = [r[0]]  # mixed-radix digits, v[i] in [0, p_i)
        for i in range(1, g.np):
            ctx = ctxs[i]
            # lo_i = (v0 + p0(v1 + ...)) mod p_i, Horner from the top
            # digit; lazy bound: shoup < 2p_i plus one v_j < p_max
            # < 2*p_min stays < 4p_i, one condsub restores [0, 2p_i)
            t = v[i - 1]
            for j in range(i - 2, -1, -1):
                w, ws = g.pmod[i][j]
                t = _condsub(shoup_mulmod(t, w, ws, ctx.pu) + v[j], ctx.two_p)
            d = r[i] + ctx.two_p - _condsub(t, ctx.two_p)  # (0, 4p_i)
            w, ws = g.inv[i]
            v.append(_condsub(shoup_mulmod(d, w, ws, ctx.pu), ctx.pu))
        x = v[-1].astype(U64)
        for j in range(g.np - 2, -1, -1):
            x = v[j].astype(U64) + U64(self.primes[j]) * x
        # negative range: lexicographic compare of digits vs prod//2
        neg = v[-1] > g.h[-1]
        eq = v[-1] == g.h[-1]
        for j in range(g.np - 2, -1, -1):
            neg = neg | (eq & (v[j] > g.h[j]))
            eq = eq & (v[j] == g.h[j])
        return x - jnp.where(neg, U64(g.prod % 2**64), U64(0))

    def backward(self, f: jax.Array, shift: int = 0) -> jax.Array:
        """(..., P, N) u32 (values < 2^31) -> (..., N) u64 coefficients."""
        if self._pallas_inv is not None:
            res = self._pallas_inv(f)
            r = [res[..., i, :] for i in range(self.n_primes)]
        else:
            r = [ntt.inverse(f[..., i, :]) for i, ntt in enumerate(self.ntts)]
        x = self.crt_reconstruct(r)
        if shift:
            x = x << U64(shift)
        return x

    def _inv_coeff_row(self, index: int) -> jax.Array:
        """Shoup pairs (P, 2, N) for the single-coefficient inverse:
        row t of plane p is M_p[index, t] where M_p is the inverse
        transform matrix in the engine's folded frequency layout.
        Computed once per (engine, index) by inverting a basis batch."""
        cache = getattr(self, "_inv_coeff_rows", None)
        if cache is None:
            cache = {}
            self._inv_coeff_rows = cache
        row = cache.get(index)
        if row is None:
            with jax.ensure_compile_time_eval():
                eye = jnp.eye(self.n, dtype=U32)  # row t = one-hot e_t
                rows = []
                for ntt in self.ntts:
                    m = ntt.inverse(eye)  # (t, coeff): column t of M_p
                    rows.append(m[:, index])  # M_p[index, t] over t
                raw = jnp.stack(rows, axis=0)  # (P, N) canonical [0, p)
                row = self.make_shoup(raw)  # (P, 2, N)
            cache[index] = row
        return row

    def backward_coeff(
        self, f: jax.Array, index: int, shift: int = 0
    ) -> jax.Array:
        """Coefficient `index` of backward(f) WITHOUT the full inverse
        transform: (..., P, N) u32 (< 2^31 lazy) -> (...,) u64.

        The inverse is linear, so one output coefficient is a dot with a
        fixed row of the inverse matrix -- O(N) Shoup multiplies instead
        of the O(N log N)-equivalent stage matmuls. Used by the GLWE
        matmul's sample extraction, where only the body's last
        coefficient is needed (reference computations.rs:109-132)."""
        key = self._inv_coeff_row(index)
        prod = self.pointwise_shoup(f, key)  # (..., P, N) in [0, 2p)
        s = jnp.sum(prod.astype(U64), axis=-1)  # < N * 2p < 2^44
        r = []
        for i, ntt in enumerate(self.ntts):
            si = s[..., i]
            lo = (si & U64(0xFFFFFFFF)).astype(U32)
            hi = (si >> U64(32)).astype(U32)
            ri = ntt.ctx.reduce_u64_pair(lo, hi)
            r.append(_condsub(ri, ntt.ctx.pu))
        x = self.crt_reconstruct(r)
        if shift:
            x = x << U64(shift)
        return x

    # -- convenience -------------------------------------------------------------

    def polymul(self, a_small: jax.Array, b_u64: jax.Array) -> jax.Array:
        fa = self.forward_small(a_small)
        fb = self.forward_u64(b_u64)
        return self.backward(self.pointwise_mul(fa, fb))


def get_folded_engine(
    n: int, primes: Sequence[int] | None = None
) -> FoldedCrtEngine:
    if primes is None:
        primes = default_primes()  # env-resolved BEFORE the cache key
    return _get_folded_engine_cached(n, tuple(primes))


@functools.lru_cache(maxsize=None)
def _get_folded_engine_cached(n: int, primes: tuple) -> FoldedCrtEngine:
    # Concrete table values even when the first construction happens
    # inside a jit trace (the engine is cached; tracer-valued tables
    # would poison every later program -- see polynomial.get_engine).
    with jax.ensure_compile_time_eval():
        return FoldedCrtEngine(n, primes)
