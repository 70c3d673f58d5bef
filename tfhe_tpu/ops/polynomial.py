"""Exact negacyclic polynomial multiplication mod 2^64 via CRT-NTT.

This is the framework's hottest primitive: every external product, CMux,
blind-rotation step, packing keyswitch and encrypted-clear dot product is
built on negacyclic (X^N + 1) polynomial multiplication of torus polynomials
(reference equivalents: tfhe-rs `polynomial_wrapping_mul` consumed at
ml/extensions/rust/src/computations.rs:50-107, and the f64 FFT engine inside
tfhe-rs `fft_impl`, imported at ml/extensions/rust/src/compression.rs:6).

TPU-first design decisions (vs the reference's f64 FFT):

  * TPUs have no fast f64, and f32 cannot carry 64-bit torus products
    exactly, so we use *integer* NTTs over 31-bit NTT-friendly primes and
    reconstruct the exact integer convolution by CRT. Exactness -- not
    approximate-FFT-with-enough-mantissa -- is the correctness story.
  * Every multiplication in TFHE is (small integer polynomial) x (u64 torus
    polynomial): gadget-decomposed digits, binary secrets and clear weights
    are all small. The u64 operand is split into 16-bit limbs; each
    (small x limb) convolution fits well inside the CRT range of two 31-bit
    primes, and limbs are recombined with wrapping shifts mod 2^64.
  * Everything is batched: transforms map over arbitrary leading dims, so a
    blind rotation over a batch of thousands of ciphertexts is one program.

Max supported small-operand magnitude: N * |a| * 2^limb_bits must stay below
p1*p2/2 (~2^61.6). For N=2048, limb_bits=16 this allows |a| < 2^34 -- ample
for every gadget base (<= 2^24), binary secrets and 8-bit clear weights.

The pure-jnp path below runs on CPU and TPU (u64 emulated as u32 pairs by
XLA); the Pallas fast path (tfhe_tpu/ops/pallas_ntt.py) implements the same
transform contract on u32 limbs natively.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

U64 = jnp.uint64

# NTT-friendly primes: 2^14 | p-1, so negacyclic transforms up to N=8192.
# p1 = 15*2^27+1, p2 = 27*2^26+1, p3 = 63*2^25+1 (prime-checked at table
# build). All < 2^31 so mod-p sums of two residues never overflow uint32:
# the NTT domain is stored and computed in u32 (VPU-native; u64 is emulated
# on TPU).
#
# LIMB-FREE design: with three primes the signed CRT range is
# p1*p2*p3/2 ~ 2^91.6, so a full u64 operand multiplies a small operand
# (|a| <= 2^16) -- or a 44-bit modulus-switched key multiplies gadget
# digits (|d| <= 2^23) -- with the exact integer convolution reconstructed
# by Garner and reduced mod 2^64. No 16-bit limb planes: one transform per
# prime per polynomial, one inverse per prime per output. (The previous
# 2-prime x 4-limb scheme ran 4x more inverse transforms and stored 8
# NTT planes per key coefficient instead of 3.)
DEFAULT_PRIMES = (2013265921, 1811939329, 2113929217)
DEFAULT_LIMB_BITS = 16  # retained for serialization compat; unused by CRT3


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 2^64."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _primitive_root(p: int) -> int:
    """Smallest primitive root of Z_p^* (p prime)."""
    factors = []
    phi = p - 1
    m = phi
    f = 2
    while f * f <= m:
        if m % f == 0:
            factors.append(f)
            while m % f == 0:
                m //= f
        f += 1
    if m > 1:
        factors.append(m)
    for g in range(2, p):
        if all(pow(g, phi // q, p) != 1 for q in factors):
            return g
    raise RuntimeError("no primitive root")


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _ntt_tables(p: int, n: int):
    """Host-side exact twiddle tables (numpy u64) for prime p, size n.

    Returns (psi_rev, psi_inv_rev, n_inv): psi is a primitive 2n-th root of
    unity mod p; tables are psi^{bitrev(i)} / psi^{-bitrev(i)} following the
    merged-twist Cooley-Tukey / Gentleman-Sande formulation, which folds the
    negacyclic twist into the butterflies (no separate pre/post scaling).
    """
    assert _is_prime(p), f"{p} is not prime"
    assert (p - 1) % (2 * n) == 0, f"2N={2*n} does not divide p-1 for p={p}"
    g = _primitive_root(p)
    psi = pow(g, (p - 1) // (2 * n), p)
    assert pow(psi, n, p) == p - 1  # primitive 2n-th root: psi^n = -1
    rev = _bitrev_indices(n)
    psi_pows = np.empty(n, dtype=np.uint64)
    psi_inv_pows = np.empty(n, dtype=np.uint64)
    psi_inv = pow(psi, p - 2, p)
    cur = 1
    cur_inv = 1
    tmp = np.empty(n, dtype=object)
    tmp_inv = np.empty(n, dtype=object)
    for i in range(n):
        tmp[i] = cur
        tmp_inv[i] = cur_inv
        cur = cur * psi % p
        cur_inv = cur_inv * psi_inv % p
    psi_pows[:] = tmp[rev].astype(np.uint64)
    psi_inv_pows[:] = tmp_inv[rev].astype(np.uint64)
    n_inv = pow(n, p - 2, p)
    return psi_pows, psi_inv_pows, np.uint64(n_inv)


def _addmod(a, b, p):
    s = a + b
    return s - jnp.where(s >= p, p, U64(0))


def _submod(a, b, p):
    s = a + (p - b)
    return s - jnp.where(s >= p, p, U64(0))


def _mulmod(a, b, p):
    # operands < p < 2^32: the u64 product is exact, one remainder reduces.
    return (a * b) % p


def fntt(a, psi_rev, p):
    """Forward negacyclic NTT (Cooley-Tukey, natural -> bit-reversed order).

    a: (..., N) u64 residues < p. Returns same shape. The output ordering is
    bit-reversed, which is irrelevant for pointwise multiplication as long
    as the inverse transform consumes the same ordering.
    """
    n = a.shape[-1]
    lead = a.shape[:-1]
    t = n
    m = 1
    while m < n:
        t //= 2
        a = a.reshape(*lead, m, 2, t)
        s = psi_rev[m : 2 * m].reshape(m, 1)
        u = a[..., 0, :]
        v = _mulmod(a[..., 1, :], s, p)
        a = jnp.stack([_addmod(u, v, p), _submod(u, v, p)], axis=-2)
        a = a.reshape(*lead, n)
        m *= 2
    return a


def intt(a, psi_inv_rev, n_inv, p):
    """Inverse negacyclic NTT (Gentleman-Sande, bit-reversed -> natural)."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    t = 1
    m = n
    while m > 1:
        h = m // 2
        a = a.reshape(*lead, h, 2, t)
        s = psi_inv_rev[h : 2 * h].reshape(h, 1)
        u = a[..., 0, :]
        v = a[..., 1, :]
        a = jnp.stack(
            [_addmod(u, v, p), _mulmod(_submod(u, v, p), s, p)], axis=-2
        )
        a = a.reshape(*lead, n)
        t *= 2
        m = h
    return _mulmod(a, n_inv, p)


class FourStepNtt:
    """MXU-native NTT mod p via the four-step algorithm with exact bf16
    limb matmuls.

    Negacyclic NTT = psi pre-twist, then cyclic DFT_N decomposed as
    N = R x C: column DFT (matmul by W_R), twiddle by omega^{rc}, row DFT
    (matmul by W_C). The mod-p matmuls split both operands into four 8-bit
    limbs evaluated as ONE stacked bf16 matmul with f32 accumulation --
    exact because 255^2 * R <= 2^22 < 2^24 for R <= 64 -- then limb blocks
    recombine with weights 2^{8(a+b)} mod p in u64.

    Output ordering is the transposed four-step order; the inverse consumes
    the same ordering, and pointwise products are order-agnostic, so the
    whole engine just has to use one ordering consistently.

    This is where the PBS FLOPs land on the MXU: on TPU the radix-2 u64
    path is emulated and HBM-bound (measured 3 PBS/s at full params); the
    four-step path moves the O(N log N) multiply work into systolic-array
    matmuls.
    """

    def __init__(self, p: int, n: int):
        self.p = p
        self.n = n
        # factor N = R*C with R,C <= 64 (exactness bound) and R,C >= 2
        r = 1
        while r * r < n:
            r *= 2
        c = n // r
        assert r * c == n and r <= 64 and c <= 64, f"unsupported N={n}"
        self.r_dim, self.c_dim = r, c
        g = _primitive_root(p)
        psi = pow(g, (p - 1) // (2 * n), p)
        omega = psi * psi % p  # primitive N-th root
        # pre/post twist vectors
        self.psi_pow = jnp.asarray(
            np.array([pow(psi, i, p) for i in range(n)], dtype=np.uint64)
        )
        n_inv = pow(n, p - 2, p)
        psi_inv = pow(psi, p - 2, p)
        self.psi_inv_ninv_pow = jnp.asarray(
            np.array(
                [pow(psi_inv, i, p) * n_inv % p for i in range(n)],
                dtype=np.uint64,
            )
        )
        # mid twiddles omega^{r'c} as an (R, C) grid (and inverse)
        omega_inv = pow(omega, p - 2, p)
        tw = np.empty((r, c), dtype=np.uint64)
        twi = np.empty((r, c), dtype=np.uint64)
        for a in range(r):
            for b in range(c):
                tw[a, b] = pow(omega, a * b, p)
                twi[a, b] = pow(omega_inv, a * b, p)
        self.twiddle = jnp.asarray(tw)
        self.twiddle_inv = jnp.asarray(twi)
        # DFT matrices: W_R[r', r] = omega_R^{r r'}, omega_R = omega^C
        om_r = pow(omega, c, p)
        om_c = pow(omega, r, p)
        om_r_inv = pow(om_r, p - 2, p)
        om_c_inv = pow(om_c, p - 2, p)
        self.w_r = self._limb_matrix(om_r, r)
        self.w_r_inv = self._limb_matrix(om_r_inv, r)
        self.w_c = self._limb_matrix(om_c, c)
        self.w_c_inv = self._limb_matrix(om_c_inv, c)
        # recombination weights 2^{8(a+b)} mod p
        self.limb_w = jnp.asarray(
            np.array([pow(2, 8 * k, p) for k in range(7)], dtype=np.uint64)
        )
        self._pu = U64(p)

    def _limb_matrix(self, root: int, dim: int) -> jax.Array:
        """(4*dim, dim) bf16: four stacked 8-bit limb planes of the DFT
        matrix W[j, i] = root^{ij} mod p."""
        w = np.empty((dim, dim), dtype=np.uint64)
        for j in range(dim):
            for i in range(dim):
                w[j, i] = pow(root, i * j, self.p)
        limbs = np.stack(
            [(w >> (8 * a)) & 0xFF for a in range(4)], axis=0
        )  # (4, dim, dim)
        return jnp.asarray(limbs.reshape(4 * dim, dim).astype(np.float32)).astype(
            jnp.bfloat16
        )

    def _mod_matmul(self, w_limbs: jax.Array, x: jax.Array) -> jax.Array:
        """W @ x mod p along the second-to-last axis of x.

        w_limbs: (4*D, D) bf16 limb planes; x: (..., D, C) u64 residues.
        """
        d = x.shape[-2]
        xl = jnp.stack(
            [((x >> U64(8 * b)) & U64(0xFF)) for b in range(4)], axis=-2
        )  # (..., D, 4, C) -- limb-major blocks on the last axis
        xl = xl.astype(jnp.bfloat16).reshape(*x.shape[:-2], d, -1)  # (..., D, 4C)
        prod = jax.lax.dot_general(
            w_limbs,
            xl,
            dimension_numbers=(((1,), (x.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4D, ..., 4C)
        prod = jnp.moveaxis(prod, 0, -2)  # (..., 4D, 4C)
        c_dim = x.shape[-1]
        prod = prod.reshape(*x.shape[:-2], 4, d, 4, c_dim)
        m = prod.astype(jnp.int32).astype(U64)  # exact integers < 2^22
        # sum limb blocks with weights 2^{8(a+b)} mod p
        acc = None
        for k in range(7):
            mk = None
            for a in range(max(0, k - 3), min(4, k + 1)):
                b = k - a
                blk = m[..., a, :, b, :]
                mk = blk if mk is None else mk + blk
            term = mk * self.limb_w[k]
            acc = term if acc is None else acc + term
        return acc % self._pu  # (..., D, C)

    def _mulmod_vec(self, x: jax.Array, tw: jax.Array) -> jax.Array:
        return (x * tw) % self._pu

    def forward(self, x: jax.Array) -> jax.Array:
        """x: (..., N) u64 residues < p -> (..., N) u64 NTT values
        (four-step ordering)."""
        r, c = self.r_dim, self.c_dim
        y = self._mulmod_vec(x, self.psi_pow)
        y = y.reshape(*x.shape[:-1], r, c)
        y = self._mod_matmul(self.w_r, y)  # column DFT
        y = self._mulmod_vec(y, self.twiddle)
        # row DFT: contract over the C axis -> move it to position -2
        y = jnp.swapaxes(y, -1, -2)  # (..., C, R)
        y = self._mod_matmul(self.w_c, y)  # (..., C, R)
        return y.reshape(*x.shape[:-1], self.n)

    def backward(self, f: jax.Array) -> jax.Array:
        """Inverse of `forward` (consumes four-step ordering)."""
        r, c = self.r_dim, self.c_dim
        y = f.reshape(*f.shape[:-1], c, r)
        y = self._mod_matmul(self.w_c_inv, y)  # undo row DFT
        y = jnp.swapaxes(y, -1, -2)  # (..., R, C)
        y = self._mulmod_vec(y, self.twiddle_inv)
        y = self._mod_matmul(self.w_r_inv, y)  # undo column DFT
        y = y.reshape(*f.shape[:-1], self.n)
        return self._mulmod_vec(y, self.psi_inv_ninv_pow)


class NegacyclicEngine:
    """Exact negacyclic polymul mod 2^64: (small int poly) x (u64 torus poly).

    Usage pattern (mirrors how keys are used): the u64 operand (bootstrap /
    keyswitch key polynomials) is transformed once with `forward_u64` and
    kept resident in NTT/limb form; per-op small operands (decomposition
    digits, secrets, clear weights) go through `forward_small`; products are
    accumulated in the transform domain and materialized with `backward`.
    """

    def __init__(
        self,
        n: int,
        primes: Sequence[int] = DEFAULT_PRIMES,
        limb_bits: int = DEFAULT_LIMB_BITS,
        ntt_impl: str = "four_step",
    ):
        assert n & (n - 1) == 0, "N must be a power of two"
        self.n = n
        self.primes = tuple(primes)
        self.limb_bits = limb_bits
        self.n_limbs = 64 // limb_bits
        assert 64 % limb_bits == 0
        self._psi = []
        self._psi_inv = []
        self._n_inv = []
        for p in self.primes:
            pr, pir, ni = _ntt_tables(p, n)
            self._psi.append(jnp.asarray(pr))
            self._psi_inv.append(jnp.asarray(pir))
            self._n_inv.append(U64(ni))
        self._p_arr = [U64(p) for p in self.primes]
        # NTT backend: "four_step" runs the DFT matmuls on the MXU (exact
        # bf16 limbs); "radix2" is the portable u64 butterfly reference.
        # A key transformed under one ordering must be consumed under the
        # same engine -- get_engine caches per (n, primes, impl).
        if ntt_impl == "four_step" and n <= 4096 and n >= 4:
            self._ntts = [FourStepNtt(p, n) for p in self.primes]
        else:
            self._ntts = None
        self.ntt_impl = "four_step" if self._ntts else "radix2"
        # Garner (mixed-radix) constants for the 3-prime CRT
        assert len(self.primes) == 3, "engine uses a 3-prime CRT"
        p1, p2, p3 = self.primes
        prod = p1 * p2 * p3
        self._inv_p1_mod_p2 = U64(pow(p1, p2 - 2, p2))
        self._inv_p1p2_mod_p3 = U64(pow(p1 * p2 % p3, p3 - 2, p3))
        self._prod_mod64 = U64(prod % 2**64)
        half = prod // 2
        self._h3 = U64(half // (p1 * p2))
        self._h2 = U64(half % (p1 * p2) // p1)
        self._h1 = U64(half % p1)
        # signed CRT headroom: N * |a| * |b| must stay below prod/2
        self.max_product_bits = int(np.floor(np.log2(prod / 2) - np.log2(n)))
        # jit the transforms: they are called eagerly from keygen /
        # encryption paths and re-trace identically otherwise.
        self.forward_small = jax.jit(self.forward_small)
        self.forward_u64 = jax.jit(self.forward_u64)
        self.backward = jax.jit(self.backward, static_argnames=("shift",))

    def _fwd(self, x: jax.Array, i: int) -> jax.Array:
        """Forward NTT of u64 residues mod prime i (impl-specific order)."""
        if self._ntts is not None:
            return self._ntts[i].forward(x)
        return fntt(x, self._psi[i], self._p_arr[i])

    def _bwd(self, x: jax.Array, i: int) -> jax.Array:
        if self._ntts is not None:
            return self._ntts[i].backward(x)
        return intt(x, self._psi_inv[i], self._n_inv[i], self._p_arr[i])

    # -- forward transforms -------------------------------------------------

    def forward_small(self, a: jax.Array) -> jax.Array:
        """Transform a small signed polynomial.

        a: (..., N) int64 (or u64 two's complement of small values).
        Returns (..., n_primes, N) u32 residues in NTT domain.
        """
        if a.dtype == jnp.uint64:
            a = a.astype(jnp.int64)
        out = []
        for i, p in enumerate(self._p_arr):
            r = jnp.mod(a, p.astype(jnp.int64)).astype(U64)
            out.append(self._fwd(r, i))
        return jnp.stack(out, axis=-2).astype(jnp.uint32)

    def forward_u64(self, b: jax.Array) -> jax.Array:
        """Transform a u64 torus polynomial (limb-free: direct residues).

        b: (..., N) u64. Returns (..., n_primes, N) u32 NTT-domain residues.
        Callers must respect the CRT headroom: the exact integer convolution
        against the other operand must stay below 2^max_product_bits --
        full-u64 operands pair with |a| <= 2^16 (binary secrets, clear
        weights, small gadget digits); bootstrap keys modulus-switch to 44
        bits to pair with |digit| <= 2^23 (see core.bootstrap).
        """
        out = []
        for i, p in enumerate(self._p_arr):
            out.append(self._fwd(b % p, i))
        return jnp.stack(out, axis=-2).astype(jnp.uint32)

    # -- transform-domain algebra -------------------------------------------

    def pointwise_mul(self, fa: jax.Array, fb: jax.Array) -> jax.Array:
        """(..., n_primes, N) x (..., n_primes, N) u32 -> u32 products."""
        fa = fa.astype(U64)
        fb = fb.astype(U64)
        out = []
        for i, p in enumerate(self._p_arr):
            out.append(_mulmod(fa[..., i, :], fb[..., i, :], p))
        return jnp.stack(out, axis=-2).astype(jnp.uint32)

    def add_domain(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Add two transform-domain tensors (residues mod each prime).
        Residues are < 2^31, so plain u32 add + conditional subtract."""
        out = []
        for i, p in enumerate(self._p_arr):
            p32 = jnp.uint32(int(p))
            s = x[..., i, :] + y[..., i, :]
            out.append(s - jnp.where(s >= p32, p32, jnp.uint32(0)))
        return jnp.stack(out, axis=-2)

    # -- inverse + reconstruction --------------------------------------------

    def crt_reconstruct(self, r: list) -> jax.Array:
        """Garner mixed-radix reconstruction of the exact signed value from
        per-prime residues (u64 arrays < p_i), reduced mod 2^64."""
        r1, r2, r3 = r
        p1, p2, p3 = self._p_arr
        v1 = r1
        v2 = _mulmod(_submod(r2, v1 % p2, p2), self._inv_p1_mod_p2, p2)
        # x mod p3 = v1 + p1*v2 (mod p3)
        lo_mod_p3 = (v1 + (p1 % p3) * v2) % p3
        v3 = _mulmod(_submod(r3, lo_mod_p3, p3), self._inv_p1p2_mod_p3, p3)
        # x = v1 + p1*(v2 + p2*v3): exact < p1*p2*p3 ~ 2^92.6; the mod-2^64
        # wrap of the Horner form is exactly x mod 2^64
        x = v1 + p1 * (v2 + p2 * v3)
        # signed centering: compare mixed-radix digits against prod/2
        neg = (v3 > self._h3) | (
            (v3 == self._h3)
            & ((v2 > self._h2) | ((v2 == self._h2) & (v1 > self._h1)))
        )
        return x - jnp.where(neg, self._prod_mod64, U64(0))

    def backward(self, f: jax.Array, shift: int = 0) -> jax.Array:
        """Inverse-transform (..., n_primes, N) u32 residues, reconstruct
        the exact value via CRT, reduce mod 2^64 and scale by 2^shift
        (shift > 0 undoes modulus-switched key storage)."""
        f = f.astype(U64)
        r = [self._bwd(f[..., i, :], i) for i in range(len(self._p_arr))]
        x = self.crt_reconstruct(r)
        if shift:
            x = x << U64(shift)
        return x

    # -- convenience ----------------------------------------------------------

    def polymul(self, a_small: jax.Array, b_u64: jax.Array) -> jax.Array:
        """Negacyclic product mod 2^64 of a small polynomial (|a| <= 2^16)
        and a u64 polynomial; shapes broadcast over leading dims."""
        fa = self.forward_small(a_small)
        fb = self.forward_u64(b_u64)
        return self.backward(self.pointwise_mul(fa, fb))


@functools.lru_cache(maxsize=None)
def get_engine(
    n: int,
    primes: Sequence[int] = DEFAULT_PRIMES,
    limb_bits: int = DEFAULT_LIMB_BITS,
    ntt_impl: str = "four_step",
) -> NegacyclicEngine:
    # The engine is lru-cached and its constructor creates device tables
    # via traced ops (.astype); if the FIRST construction happens inside
    # a jit trace, those tables would be TRACERS of that trace and every
    # later program reusing the cached engine dies with KeyError: Var.
    # ensure_compile_time_eval forces concrete (eager) table values no
    # matter where the first call happens.
    with jax.ensure_compile_time_eval():
        return NegacyclicEngine(n, primes, limb_bits, ntt_impl)


def negacyclic_polymul_reference(a, b, q: int = 2**64) -> np.ndarray:
    """Slow exact ground truth with Python integers (tests only).

    a, b: 1-D integer sequences (any int type / Python ints).
    Returns numpy object array of the negacyclic product mod q.
    """
    n = len(a)
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] = (out[k] + a[i] * b[j]) % q
            else:
                out[k - n] = (out[k - n] - a[i] * b[j]) % q
    return np.array(out, dtype=object)
