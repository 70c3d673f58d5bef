"""End-to-end FHE inference: every layer server-side, zero client-side
nonlinearities.

Round 1's EXECUTE mode applied TLUs client-side between encrypted linear
segments (the hybrid split). This module is the full-FHE path the
reference's concrete-ml EXECUTE mode implements (reference:
ml/concrete-ml/src/concrete/ml/quantization/quantized_module.py forward
under FheMode.EXECUTE runs the whole circuit, TLUs included, under FHE;
torch/compile.py:282): the client encrypts ONCE, the server runs linear
layers as exact LWE linear combinations of clear quantized weights and
every nonlinearity as a programmable bootstrap, and the client decrypts
ONCE at the end.

Accumulator discipline (the concrete-ml "accumulator bit-width"
constraint, post_training.py): a linear combination sum(w * x) of
shortint ciphertexts must stay inside the msg*carry plaintext space
(16 values at 2_2 params) before the next PBS re-quantizes it. compile()
verifies this per layer from the calibrated ranges and raises with the
reference's guidance (reduce n_bits / weight magnitude) when violated --
this is precisely the search space `p_error_search` walks.

Signed accumulators use offset encoding: the TLU table is shifted so
acc + offset lands in [0, space); the offset rides a trivial ciphertext.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.models import shortint as si
from tfhe_tpu.params import ShortintParams
from tfhe_tpu.rng import FheRng

U64 = jnp.uint64


class AccumulatorOverflow(ValueError):
    pass


@dataclasses.dataclass
class FheTensor:
    """Batched LWE ciphertexts holding small ints: blocks (..., n+1),
    each encrypting one value in [0, space)."""

    ct: object  # jax array (..., n+1)
    params: ShortintParams
    degree: int  # max plaintext value (concrete-ml degree tracking)

    @property
    def shape(self):
        return self.ct.shape[:-1]


def _space(p: ShortintParams) -> int:
    return p.message_modulus * p.carry_modulus


class FheLinear:
    """y = x @ w (+ b): EXACT linear combination of LWE ciphertexts with
    clear integer weights -- no PBS, no noise refresh. Weights must be
    small signed ints (ternary / few-bit); compile() checks the
    accumulator range."""

    def __init__(self, w_int: np.ndarray, b_int: np.ndarray | None = None):
        self.w = np.asarray(w_int, dtype=np.int64)  # (C, O)
        self.b = None if b_int is None else np.asarray(b_int, dtype=np.int64)

    def clear_apply(self, v: np.ndarray) -> np.ndarray:
        out = v @ self.w
        return out if self.b is None else out + self.b

    def out_range(self, in_lo: int, in_hi: int) -> tuple[int, int]:
        wpos = np.maximum(self.w, 0).sum(axis=0)
        wneg = np.minimum(self.w, 0).sum(axis=0)
        lo = (wneg * in_hi + wpos * in_lo).min()
        hi = (wpos * in_hi + wneg * in_lo).max()
        if self.b is not None:
            lo += int(self.b.min())
            hi += int(self.b.max())
        return int(lo), int(hi)

    def forward(self, x: FheTensor) -> tuple:
        # ciphertext-linear: multiply each input ct by w (wrapping u64)
        # and sum; signed weights ride two's complement
        w_u = jnp.asarray(self.w.astype(np.uint64))  # (C, O), two's complement
        acc = jnp.einsum(
            "...ci,co->...oi", jnp.asarray(x.ct, dtype=U64), w_u
        )  # einsum over u64: exact wrapping sums
        if self.b is not None:
            enc_b = [(int(b) * x.params.delta) % (1 << 64) for b in self.b]
            acc = acc.at[..., -1].add(jnp.asarray(enc_b, dtype=U64))
        return acc


class FheTlu:
    """Elementwise nonlinearity as one programmable bootstrap per value.

    table_fn maps the true integer accumulator value to the next layer's
    quantized input in [0, space). Signed accumulators are offset into
    [0, space) and the offset is folded into the table."""

    def __init__(self, table_fn: Callable[[int], int]):
        self.table_fn = table_fn
        self.offset = 0  # set at compile time from the input range

    def make_lut(self, p: ShortintParams):
        space = _space(p)
        table = [
            int(self.table_fn(v - self.offset)) % space for v in range(space)
        ]
        return si.generate_lut(p, np.asarray(table, dtype=np.uint64))


class FheSequential:
    """compile() -> run(encrypted) with no intermediate decrypts."""

    def __init__(self, layers: Sequence, params: ShortintParams, seed: int = 0):
        self.layers = list(layers)
        self.params = params
        self.ck, self.sk = si.keygen(params, seed=seed)
        self._luts = None
        self.input_range = (0, params.message_modulus - 1)

    def compile(self, input_hi: int | None = None):
        """Walk calibrated ranges through the network; fit every TLU's
        offset; fail closed on accumulator overflow."""
        p = self.params
        space = _space(p)
        lo, hi = 0, input_hi if input_hi is not None else space - 1
        self._luts = []
        for i, layer in enumerate(self.layers):
            if isinstance(layer, FheLinear):
                lo, hi = layer.out_range(lo, hi)
                if hi - lo + 1 > space:
                    raise AccumulatorOverflow(
                        f"layer {i}: accumulator range [{lo}, {hi}] exceeds "
                        f"the {space}-value plaintext space; reduce weight "
                        f"magnitude or activation bits (the reference's "
                        f"n_bits / p_error search trades these off)"
                    )
            elif isinstance(layer, FheTlu):
                layer.offset = -lo
                self._luts.append(layer.make_lut(p))
                # table outputs are the next layer's inputs
                outs = [
                    int(layer.table_fn(v)) % space for v in range(lo, hi + 1)
                ]
                lo, hi = min(outs), max(outs)
            else:
                raise TypeError(type(layer))
        self.output_range = (lo, hi)
        return self

    def encrypt(self, x_q: np.ndarray, seed: int = 99) -> FheTensor:
        """x_q: (..., C) ints in [0, input_hi]."""
        ct = si.encrypt(self.ck, jnp.asarray(x_q, dtype=U64), FheRng(seed))
        return FheTensor(ct=ct.ct, params=self.params, degree=int(x_q.max()))

    def run(self, x: FheTensor) -> FheTensor:
        """Server-side: every op on ciphertexts; NO decrypt anywhere."""
        assert self._luts is not None, "compile() first"
        p = self.params
        ct = x.ct
        lut_i = 0
        for layer in self.layers:
            if isinstance(layer, FheLinear):
                ct = layer.forward(FheTensor(ct=ct, params=p, degree=0))
            else:
                # offset into [0, space), then one batched PBS
                off = layer.offset
                if off:
                    ct = ct.at[..., -1].add(U64((off * p.delta) % (1 << 64)))
                wrapped = si.Ciphertext(
                    ct=ct, params=p, degree=_space(p) - 1, noise_level=1
                )
                out = si.apply_lut(
                    self.sk, wrapped, self._luts[lut_i], _space(p) - 1
                )
                ct = out.ct
                lut_i += 1
        return FheTensor(ct=ct, params=p, degree=_space(p) - 1)

    def decrypt(self, y: FheTensor) -> np.ndarray:
        c = si.Ciphertext(ct=y.ct, params=self.params, degree=_space(self.params) - 1, noise_level=1)
        return np.asarray(si.decrypt(self.ck, c)).astype(np.int64)

    def clear_forward(self, x_q: np.ndarray) -> np.ndarray:
        """Integer reference pipeline (DISABLE mode): must match run()."""
        space = _space(self.params)
        v = np.asarray(x_q, dtype=np.int64)
        for layer in self.layers:
            if isinstance(layer, FheLinear):
                v = layer.clear_apply(v)
            else:
                v = np.vectorize(lambda t: int(layer.table_fn(t)) % space)(v)
        return v % space


class FheConv2d(FheLinear):
    """2-D convolution on ciphertexts: im2col GATHER of the input LWE
    blocks into patches (free -- indexing, no crypto), then ONE exact
    linear contraction of each patch against the (Cout, Cin*kh*kw)
    kernel matrix. This is the MXU-native LWE form of the reference's
    Conv lowering (quantized_ops.py QuantizedConv -> integer matmul):
    the contraction is a single batched einsum over the patch axis
    instead of conv2d_as_linear's sparse (Cin*H*W, Cout*oh*ow) matrix.

    Input layout: the FheTensor's value axis is the flattened (Cin, H, W)
    image; output value axis is flattened (Cout, oh, ow) -- the same
    channel-major order conv2d_as_linear produces, so heads chain
    identically."""

    def __init__(self, w_int: np.ndarray, in_hw: tuple,
                 b_int: np.ndarray | None = None, stride: int = 1):
        cout, cin, kh, kw = np.asarray(w_int).shape
        h, wdt = in_hw
        oh = (h - kh) // stride + 1
        ow = (wdt - kw) // stride + 1
        self.wmat = np.asarray(w_int, np.int64).reshape(cout, cin * kh * kw)
        self.out_hw = (oh, ow)
        self.cout = cout
        # gather map: patch p = (y, x) -> flat indices of its K inputs
        idx = np.empty((oh * ow, cin * kh * kw), dtype=np.int64)
        for y in range(oh):
            for x in range(ow):
                k = 0
                for ci in range(cin):
                    for dy in range(kh):
                        for dx in range(kw):
                            idx[y * ow + x, k] = (
                                (ci * h + y * stride + dy) * wdt
                                + x * stride + dx
                            )
                            k += 1
        self.idx = idx
        # per-output-channel bias broadcast over the oh*ow positions
        self.b = None
        if b_int is not None:
            self.b = np.repeat(np.asarray(b_int, np.int64), oh * ow)

    def clear_apply(self, v: np.ndarray) -> np.ndarray:
        out = np.einsum("...lk,ok->...ol", v[..., self.idx], self.wmat)
        out = out.reshape(*out.shape[:-2], -1)
        return out if self.b is None else out + self.b

    def out_range(self, in_lo: int, in_hi: int) -> tuple[int, int]:
        wpos = np.maximum(self.wmat, 0).sum(axis=1)
        wneg = np.minimum(self.wmat, 0).sum(axis=1)
        lo = int((wneg * in_hi + wpos * in_lo).min())
        hi = int((wpos * in_hi + wneg * in_lo).max())
        if self.b is not None:
            lo += int(self.b.min())
            hi += int(self.b.max())
        return lo, hi

    def forward(self, x: FheTensor) -> tuple:
        ct = jnp.asarray(x.ct, dtype=U64)  # (..., Cin*H*W, n+1)
        patches = ct[..., jnp.asarray(self.idx), :]  # (..., L, K, n+1)
        w_u = jnp.asarray(self.wmat.astype(np.uint64))  # (Cout, K)
        acc = jnp.einsum("...lki,ok->...oli", patches, w_u)  # (..., Cout, L, n+1)
        acc = acc.reshape(*acc.shape[:-3], -1, acc.shape[-1])
        if self.b is not None:
            enc_b = [(int(b) * x.params.delta) % (1 << 64) for b in self.b]
            acc = acc.at[..., -1].add(jnp.asarray(enc_b, dtype=U64))
        return acc


def conv2d_as_linear(w: np.ndarray, in_hw: tuple, stride: int = 1) -> FheLinear:
    """Lower a (Cout, Cin, Kh, Kw) integer conv to an FheLinear over the
    flattened input (the im2col-free dense form; fine at toy sizes --
    the reference lowers conv via onnx to matmul the same way)."""
    cout, cin, kh, kw = w.shape
    h, wdt = in_hw
    oh = (h - kh) // stride + 1
    ow = (wdt - kw) // stride + 1
    m = np.zeros((cin * h * wdt, cout * oh * ow), dtype=np.int64)
    for co in range(cout):
        for y in range(oh):
            for x in range(ow):
                o = (co * oh + y) * ow + x
                for ci in range(cin):
                    for dy in range(kh):
                        for dx in range(kw):
                            i = (ci * h + y * stride + dy) * wdt + x * stride + dx
                            m[i, o] = w[co, ci, dy, dx]
    return FheLinear(m)
