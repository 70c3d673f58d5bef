"""Radix big integers: euint8..euint256 as vectors of shortint blocks.

The fhevm encrypted types (ebool, euint8..euint256; reference type registry
sdk/relayer/src/sdk/FheType.ts:17-78) are radix integers over 2-bit-message
blocks (reference: ml/extensions/rust/src/radix_utils.rs:21-51 -- FheUint64
is 32 blocks of PARAM_MESSAGE_2_CARRY_2). Operation semantics here follow
the reference's fhevm operator corpus (reference:
tests/fhevm-suite/e2e/contracts/operations/FHEVMTestSuite1-7.sol + the
2,394 clear-math test cases of e2e/test/fhevmOperations/*.ts): wrapping
mod-2^nbits arithmetic, unsigned comparisons, boolean select.

TPU-first layout: a radix ciphertext is ONE tensor (..., nblocks, kN+1);
the block axis is a batch axis, so blockwise LUTs over all blocks of all
ciphertexts in a batch are a single PBS program. Sequential structure
(carry chains) runs over blocks only; throughput comes from the leading
batch dims, mirroring the batched-PBS dispatcher design (SURVEY.md section
2, parallelism table).

Multi-LUT batching: where different blocks need different LUTs in the same
round (message+carry extract, schoolbook partial products), the LUT tensor
is stacked along a leading axis aligned with the stacked ciphertexts -- one
blind-rotation program evaluates them all.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.core.bootstrap import programmable_bootstrap
from tfhe_tpu.core.lwe import keyswitch, trivial_lwe
from tfhe_tpu.models import shortint as si
from tfhe_tpu.models.shortint import ClientKey, ServerKey
from tfhe_tpu.params import ShortintParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("params", "degrees"))
class RadixCiphertext:
    """blocks: (..., nblocks, kN+1); degrees: per-block max value."""

    blocks: jax.Array
    params: ShortintParams
    degrees: tuple

    @property
    def nblocks(self) -> int:
        return len(self.degrees)

    @property
    def nbits(self) -> int:
        return self.nblocks * _bits_per_block(self.params)

    @property
    def batch_shape(self):
        return self.blocks.shape[:-2]


def _bits_per_block(params: ShortintParams) -> int:
    return int(math.log2(params.message_modulus))


def blocks_for_bits(params: ShortintParams, nbits: int) -> int:
    bpb = _bits_per_block(params)
    assert nbits % bpb == 0
    return nbits // bpb


# -- client side ---------------------------------------------------------------


def encrypt_radix(
    ck: ClientKey, values, nbits: int, rng: FheRng
) -> RadixCiphertext:
    """values: (...,) unsigned ints (python ints or u64 array) -> radix ct."""
    p = ck.params
    nb = blocks_for_bits(p, nbits)
    bpb = _bits_per_block(p)
    values = jnp.asarray(values, dtype=U64)
    shifts = jnp.arange(nb, dtype=U64) * U64(bpb)
    blocks_pt = (values[..., None] >> shifts) & U64(p.message_modulus - 1)
    from tfhe_tpu.core.lwe import encrypt_lwe

    ct = encrypt_lwe(ck.big_lwe_key, encode(blocks_pt, p.delta), rng, p.glwe_noise)
    return RadixCiphertext(
        blocks=ct, params=p, degrees=(p.message_modulus - 1,) * nb
    )


def encrypt_radix_bigint(
    ck: ClientKey, values: list, nbits: int, rng: FheRng
) -> RadixCiphertext:
    """Exact big-int radix encryption (euint128/256: python ints wider
    than u64; reference FheUint128/256 radix lists, radix_utils.rs:21-51)."""
    p = ck.params
    nb = blocks_for_bits(p, nbits)
    bpb = _bits_per_block(p)
    mask = p.message_modulus - 1
    rows = [
        [(int(v) >> (bpb * i)) & mask for i in range(nb)] for v in values
    ]
    blocks_pt = jnp.asarray(rows, dtype=U64)
    from tfhe_tpu.core.lwe import encrypt_lwe

    ct = encrypt_lwe(ck.big_lwe_key, encode(blocks_pt, p.delta), rng, p.glwe_noise)
    return RadixCiphertext(
        blocks=ct, params=p, degrees=(p.message_modulus - 1,) * nb
    )


def decrypt_radix(ck: ClientKey, c: RadixCiphertext) -> jax.Array:
    """Decrypt to u64 (callers mask to nbits; nbits > 64 uses decrypt_radix_bigint)."""
    p = ck.params
    from tfhe_tpu.core.lwe import decrypt_lwe

    space = p.message_modulus * p.carry_modulus
    vals = decode(decrypt_lwe(ck.big_lwe_key, c.blocks), p.delta, space)
    bpb = _bits_per_block(p)
    shifts = jnp.arange(c.nblocks, dtype=U64) * U64(bpb)
    total = jnp.sum(vals << shifts, axis=-1, dtype=U64)
    if c.nbits >= 64:
        return total
    return total & U64((1 << c.nbits) - 1)


def decrypt_radix_bigint(ck: ClientKey, c: RadixCiphertext) -> list:
    """Exact big-int decryption (euint128/256): returns python ints."""
    p = ck.params
    from tfhe_tpu.core.lwe import decrypt_lwe

    space = p.message_modulus * p.carry_modulus
    vals = np.asarray(decode(decrypt_lwe(ck.big_lwe_key, c.blocks), p.delta, space))
    bpb = _bits_per_block(p)
    flat = vals.reshape(-1, c.nblocks)
    out = []
    for row in flat:
        total = sum(int(v) << (bpb * i) for i, v in enumerate(row))
        out.append(total % (1 << c.nbits))
    return out


def trivial_radix_bigint(
    params: ShortintParams, values: list, nbits: int
) -> RadixCiphertext:
    """Trivial encryption of python ints wider than u64 (eaddress/ebytes
    scalar operands)."""
    p = params
    nb = blocks_for_bits(p, nbits)
    bpb = _bits_per_block(p)
    mask = p.message_modulus - 1
    rows = [[(int(v) >> (bpb * i)) & mask for i in range(nb)] for v in values]
    blocks_pt = jnp.asarray(rows, dtype=U64)
    ct = trivial_lwe(encode(blocks_pt, p.delta), p.big_lwe_dimension)
    return RadixCiphertext(
        blocks=ct, params=p, degrees=(p.message_modulus - 1,) * nb
    )


def trivial_radix(params: ShortintParams, values, nbits: int) -> RadixCiphertext:
    p = params
    nb = blocks_for_bits(p, nbits)
    bpb = _bits_per_block(p)
    # True per-block degrees when the values are concrete (not traced):
    # a trivial ZERO then has degree 0, which lets select() take its
    # one-PBS-per-block fast path (the ERC20 `moved` gate saves 32
    # PBS/transfer on this alone). Under a tracer fall back to m-1.
    degrees = None
    if not isinstance(values, jax.core.Tracer):
        try:
            vals_np = np.asarray(values, dtype=np.uint64).reshape(-1)
            mask = np.uint64(p.message_modulus - 1)
            degrees = tuple(
                int(((vals_np >> np.uint64(bpb * i)) & mask).max())
                for i in range(nb)
            )
        except Exception:
            degrees = None
    if degrees is None:
        degrees = (p.message_modulus - 1,) * nb
    values = jnp.asarray(values, dtype=U64)
    shifts = jnp.arange(nb, dtype=U64) * U64(bpb)
    blocks_pt = (values[..., None] >> shifts) & U64(p.message_modulus - 1)
    ct = trivial_lwe(encode(blocks_pt, p.delta), p.big_lwe_dimension)
    return RadixCiphertext(blocks=ct, params=p, degrees=degrees)


# -- PBS plumbing ----------------------------------------------------------------


# Flat-batch buckets: every PBS dispatch pads its flattened batch up to
# one of these, so the WHOLE radix layer compiles O(#buckets) device
# programs instead of one per (stack, batch, nblocks) shape -- the
# ERC20 cold compile was 1988 s mostly from shape proliferation through
# the remote-compile tunnel (VERDICT r4 item 5). Powers of two plus
# 3*2^k midpoints cap the padding waste at 33%.
_PBS_BUCKETS = tuple(
    sorted({1 << k for k in range(2, 17)} | {3 << k for k in range(2, 15)})
)


def _bucket(n: int) -> int:
    for b in _PBS_BUCKETS:
        if n <= b:
            return b
    return n


def _pbs_flat(sk: ServerKey, ct: jax.Array, lut: jax.Array) -> jax.Array:
    """(B, kN+1) x (B, k+1, N) -> (B, kN+1): the one canonical PBS
    program shape per bucket B."""
    engine = si.engine_for(sk.params)
    small = keyswitch(ct, sk.ksk)
    from tfhe_tpu.core.multibit import (
        MultiBitBootstrapKey,
        multibit_programmable_bootstrap,
    )

    if isinstance(sk.bsk, MultiBitBootstrapKey):
        return multibit_programmable_bootstrap(small, lut, sk.bsk, engine)
    return programmable_bootstrap(small, lut, sk.bsk, engine)


def _pbs(sk: ServerKey, ct: jax.Array, lut: jax.Array) -> jax.Array:
    """Raw batched PBS: ct (..., kN+1), lut broadcastable (..., k+1, N).
    Dispatches on the key type (classic vs multi-bit), like si.apply_lut.

    The batch dims are FLATTENED and padded to a size bucket before
    dispatch so every radix op shares the same per-bucket device
    program (cold-compile count drops from one per op shape to one per
    bucket; padding rows bootstrap zeros and are sliced away)."""
    batch = ct.shape[:-1]
    b = 1
    for d in batch:
        b *= d
    lut_b = jnp.broadcast_to(lut, batch + lut.shape[-2:])
    flat_ct = ct.reshape(b, ct.shape[-1])
    flat_lut = lut_b.reshape(b, *lut.shape[-2:])
    bp = _bucket(b)
    if bp != b:
        flat_ct = jnp.concatenate(
            [flat_ct, jnp.zeros((bp - b, flat_ct.shape[-1]), dtype=flat_ct.dtype)]
        )
        flat_lut = jnp.concatenate(
            [flat_lut, jnp.zeros((bp - b,) + flat_lut.shape[1:], dtype=flat_lut.dtype)]
        )
    out = _pbs_flat(sk, flat_ct, flat_lut)
    return out[:b].reshape(batch + (out.shape[-1],))


def _lut(params: ShortintParams, table) -> jax.Array:
    return si.generate_lut(params, np.asarray(table, dtype=np.uint64))


def _lut_table(params: ShortintParams, f: Callable) -> np.ndarray:
    space = params.message_modulus * params.carry_modulus
    return np.array([int(f(v)) % space for v in range(space)], dtype=np.uint64)


def _stacked_pbs(sk: ServerKey, cts: Sequence[jax.Array], tables) -> list:
    """Run len(cts) PBS with (possibly different) LUTs as ONE program.

    cts: list of (..., kN+1) with identical shapes; tables: list of LUT
    value tables. Returns list of outputs. The stacked leading axis rides
    the batch dims -- a single keyswitch + blind rotation for all of them.
    """
    p = sk.params
    stack = jnp.stack(list(cts), axis=0)  # (T, ..., kN+1)
    luts = jnp.stack([_lut(p, t) for t in tables], axis=0)  # (T, k+1, N)
    # align LUT dims with the ciphertext batch dims
    extra = stack.ndim - 1 - 1  # batch dims beyond the stack axis
    luts = luts.reshape((luts.shape[0],) + (1,) * extra + luts.shape[1:])
    out = _pbs(sk, stack, luts)
    return [out[i] for i in range(len(cts))]


# -- carry propagation -------------------------------------------------------------


def propagate_carries(sk: ServerKey, c: RadixCiphertext) -> RadixCiphertext:
    """Flush carries block by block (sequential in nblocks, batched over
    the leading dims). Result blocks are fresh (degree msg_mod-1)."""
    p = sk.params
    m = p.message_modulus
    space = m * p.carry_modulus
    msg_table = _lut_table(p, lambda v: v % m)
    car_table = _lut_table(p, lambda v: v // m)
    out_blocks = []
    out_degrees = []
    carry_ct = None
    carry_deg = 0
    for i in range(c.nblocks):
        blk = c.blocks[..., i, :]
        deg = c.degrees[i] + carry_deg
        if carry_ct is not None:
            blk = blk + carry_ct
        assert deg < space, f"block {i} degree {deg} overflows before flush"
        if deg < m:
            # nothing to flush and no carry can emerge
            out_blocks.append(blk)
            out_degrees.append(deg)
            carry_ct, carry_deg = None, 0
            continue
        if i == c.nblocks - 1:
            (msg,) = _stacked_pbs(sk, [blk], [msg_table])
            carry_ct, carry_deg = None, 0
        else:
            msg, carry_ct = _stacked_pbs(sk, [blk, blk], [msg_table, car_table])
            carry_deg = deg // m
        out_blocks.append(msg)
        out_degrees.append(min(deg, m - 1))
    return RadixCiphertext(
        blocks=jnp.stack(out_blocks, axis=-2),
        params=p,
        degrees=tuple(out_degrees),
    )


def _fresh(sk: ServerKey, c: RadixCiphertext) -> RadixCiphertext:
    """Ensure every block is a pure message (degree < msg_mod)."""
    if max(c.degrees) >= sk.params.message_modulus:
        return propagate_carries(sk, c)
    return c


# -- linear ops ---------------------------------------------------------------------


def add(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
    assert a.nblocks == b.nblocks
    p = sk.params
    space = p.message_modulus * p.carry_modulus
    if any(da + db >= space for da, db in zip(a.degrees, b.degrees)):
        a = _fresh(sk, a)
        b = _fresh(sk, b)
    out = RadixCiphertext(
        blocks=a.blocks + b.blocks,
        params=p,
        degrees=tuple(da + db for da, db in zip(a.degrees, b.degrees)),
    )
    return propagate_carries(sk, out)


def bitnot_blocks(sk: ServerKey, a: RadixCiphertext) -> RadixCiphertext:
    """(msg_mod-1) - x per block; needs fresh blocks. No PBS."""
    p = sk.params
    a = _fresh(sk, a)
    top = encode(jnp.asarray(p.message_modulus - 1, dtype=U64), p.delta)
    new = (-a.blocks).at[..., -1].add(top)
    return RadixCiphertext(
        blocks=new, params=p, degrees=(p.message_modulus - 1,) * a.nblocks
    )


def sub(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
    """a - b = a + ~b + 1 (two's complement in base msg_mod)."""
    p = sk.params
    nb = a.nblocks
    notb = bitnot_blocks(sk, b)
    a = _fresh(sk, a)
    s = a.blocks + notb.blocks
    one = encode(jnp.asarray(1, dtype=U64), p.delta)
    s = s.at[..., 0, -1].add(one)
    degs = [a.degrees[i] + notb.degrees[i] + (1 if i == 0 else 0) for i in range(nb)]
    return propagate_carries(
        sk, RadixCiphertext(blocks=s, params=p, degrees=tuple(degs))
    )


def add_sub(
    sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext
) -> tuple[RadixCiphertext, RadixCiphertext]:
    """(a + b, a - b) sharing ONE stacked carry chain.

    The ERC20 transfer's hot pair (balance +/- moved): stacking the two
    pre-carry block tensors doubles the per-round PBS batch and halves
    the dispatch count vs calling add() then sub() (reference flow
    erc20.ts:20-76 runs them back to back)."""
    assert a.nblocks == b.nblocks
    p = sk.params
    m = p.message_modulus
    a = _fresh(sk, a)
    b = _fresh(sk, b)
    notb_blocks = (-b.blocks).at[..., -1].add(
        encode(jnp.asarray(m - 1, dtype=U64), p.delta)
    )
    s_add = a.blocks + b.blocks
    s_sub = a.blocks + notb_blocks
    one = encode(jnp.asarray(1, dtype=U64), p.delta)
    s_sub = s_sub.at[..., 0, -1].add(one)
    stacked = jnp.stack([s_add, s_sub], axis=0)
    degs = tuple(
        max(
            a.degrees[i] + b.degrees[i],
            a.degrees[i] + (m - 1) + (1 if i == 0 else 0),
        )
        for i in range(a.nblocks)
    )
    out = propagate_carries(
        sk, RadixCiphertext(blocks=stacked, params=p, degrees=degs)
    )
    mk = lambda blk: RadixCiphertext(blocks=blk, params=p, degrees=out.degrees)
    return mk(out.blocks[0]), mk(out.blocks[1])


def neg(sk: ServerKey, a: RadixCiphertext) -> RadixCiphertext:
    return sub(sk, trivial_radix(sk.params, jnp.zeros(a.batch_shape, dtype=U64), a.nbits), a)


def scalar_add(sk: ServerKey, a: RadixCiphertext, s: int) -> RadixCiphertext:
    return add(sk, a, trivial_radix(sk.params, jnp.full(a.batch_shape, s % (1 << a.nbits), dtype=U64), a.nbits))


def scalar_sub(sk: ServerKey, a: RadixCiphertext, s: int) -> RadixCiphertext:
    return sub(sk, a, trivial_radix(sk.params, jnp.full(a.batch_shape, s % (1 << a.nbits), dtype=U64), a.nbits))


# -- bitwise ops ----------------------------------------------------------------------


def _bivariate_blocks(
    sk: ServerKey,
    a: RadixCiphertext,
    b: RadixCiphertext,
    f: Callable,
    out_degree_f: Callable | None = None,
) -> RadixCiphertext:
    """Apply f(a_i, b_i) to every aligned block pair in one PBS program."""
    p = sk.params
    m = p.message_modulus
    a = _fresh(sk, a)
    b = _fresh(sk, b)
    packed = a.blocks * U64(m) + b.blocks
    table = _lut_table(p, lambda v: f(v // m, v % m))
    out = _pbs(sk, packed, _lut(p, table))
    if out_degree_f is None:
        degs = tuple(int(table.max()) for _ in range(a.nblocks))
    else:
        degs = tuple(
            out_degree_f(da, db) for da, db in zip(a.degrees, b.degrees)
        )
    return RadixCiphertext(blocks=out, params=p, degrees=degs)


def bitand(sk: ServerKey, a, b) -> RadixCiphertext:
    return _bivariate_blocks(sk, a, b, lambda x, y: x & y)


def bitor(sk: ServerKey, a, b) -> RadixCiphertext:
    return _bivariate_blocks(sk, a, b, lambda x, y: x | y)


def bitxor(sk: ServerKey, a, b) -> RadixCiphertext:
    return _bivariate_blocks(sk, a, b, lambda x, y: x ^ y)


def bitnot(sk: ServerKey, a: RadixCiphertext) -> RadixCiphertext:
    return bitnot_blocks(sk, a)


# -- multiplication ---------------------------------------------------------------------


def mul(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
    """Schoolbook block multiply mod 2^nbits.

    All partial products (lo and hi halves of every block pair) are computed
    in ONE stacked bivariate PBS; columns are then summed with carry flushes.
    """
    p = sk.params
    m = p.message_modulus
    nb = a.nblocks
    a = _fresh(sk, a)
    b = _fresh(sk, b)
    # enumerate partial products contributing below 2^nbits
    jobs = []  # (column, kind)
    cts = []
    tables = []
    lo_table = _lut_table(p, lambda v: ((v // m) * (v % m)) % m)
    hi_table = _lut_table(p, lambda v: ((v // m) * (v % m)) // m)
    for i in range(nb):
        for j in range(nb):
            if i + j < nb:
                packed = a.blocks[..., i, :] * U64(m) + b.blocks[..., j, :]
                cts.append(packed)
                tables.append(lo_table)
                jobs.append((i + j, m - 1))
            if i + j + 1 < nb:
                packed = a.blocks[..., i, :] * U64(m) + b.blocks[..., j, :]
                cts.append(packed)
                tables.append(hi_table)
                jobs.append((i + j + 1, (m - 1) * (m - 1) // m))
    outs = _stacked_pbs(sk, cts, tables)
    columns = [[] for _ in range(nb)]  # (ct, degree) terms per column
    for (col, deg), ct in zip(jobs, outs):
        columns[col].append((ct, deg))
    return _sum_columns(sk, columns)


def _sum_columns(sk: ServerKey, columns: list) -> RadixCiphertext:
    """Sum per-column term lists into a radix ciphertext, flushing carries
    whenever a column's accumulated degree would overflow the carry space."""
    p = sk.params
    m = p.message_modulus
    space = m * p.carry_modulus
    nb = len(columns)
    msg_table = _lut_table(p, lambda v: v % m)
    car_table = _lut_table(p, lambda v: v // m)
    zero = None
    while True:
        # accumulate within capacity
        acc = []
        for col in range(nb):
            terms = columns[col]
            if not terms:
                if zero is None:
                    shape = columns[_first_nonempty(columns)][0][0].shape
                    zero = jnp.zeros(shape, dtype=U64)
                acc.append((zero, 0))
                continue
            ct, deg = terms[0]
            for t_ct, t_deg in terms[1:]:
                if deg + t_deg >= space:
                    break
                ct = ct + t_ct
                deg += t_deg
            acc.append((ct, deg))
            columns[col] = terms[_consumed_count(terms, space) :]
        if all(not columns[c] for c in range(nb)) and all(
            deg < m for _, deg in acc
        ):
            blocks = jnp.stack([ct for ct, _ in acc], axis=-2)
            return RadixCiphertext(
                blocks=blocks, params=p, degrees=tuple(d for _, d in acc)
            )
        # flush: message back into column, carry into next column's terms
        flush_cts = []
        flush_tables = []
        for col in range(nb):
            ct, deg = acc[col]
            flush_cts.append(ct)
            flush_tables.append(msg_table)
            if col + 1 < nb and deg >= m:
                flush_cts.append(ct)
                flush_tables.append(car_table)
        outs = _stacked_pbs(sk, flush_cts, flush_tables)
        oi = 0
        new_columns = [[] for _ in range(nb)]
        for col in range(nb):
            ct, deg = acc[col]
            msg = outs[oi]
            oi += 1
            new_columns[col].insert(0, (msg, min(deg, m - 1)))
            if col + 1 < nb and deg >= m:
                carry = outs[oi]
                oi += 1
                new_columns[col + 1].append((carry, deg // m))
        # keep any unconsumed leftovers
        for col in range(nb):
            new_columns[col].extend(columns[col])
        columns = new_columns


def _first_nonempty(columns):
    for i, c in enumerate(columns):
        if c:
            return i
    raise ValueError("all columns empty")


def _consumed_count(terms, space):
    deg = terms[0][1]
    n = 1
    for _, td in terms[1:]:
        if deg + td >= space:
            break
        deg += td
        n += 1
    return n


# -- comparisons -----------------------------------------------------------------------


def _tree_reduce_blocks(
    sk: ServerKey, items: list, combine_f: Callable, max_val: int
) -> jax.Array:
    """Tree-reduce single blocks with a bivariate LUT combine. items:
    list of (..., kN+1) blocks with values <= max_val < msg_mod."""
    p = sk.params
    m = p.message_modulus
    assert max_val < m
    table = _lut_table(p, lambda v: combine_f(v // m, v % m))
    while len(items) > 1:
        cts = []
        carry = items[-1] if len(items) % 2 else None
        for i in range(0, len(items) - (1 if carry is not None else 0), 2):
            cts.append(items[i] * U64(m) + items[i + 1])
        outs = _stacked_pbs(sk, cts, [table] * len(cts)) if cts else []
        items = outs + ([carry] if carry is not None else [])
    return items[0]


def eq(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext):
    """Returns an encrypted boolean block (value in {0,1})."""
    ne_blocks = _bivariate_blocks(sk, a, b, lambda x, y: 1 if x != y else 0)
    items = [ne_blocks.blocks[..., i, :] for i in range(ne_blocks.nblocks)]
    any_ne = _tree_reduce_blocks(sk, items, lambda x, y: int(bool(x or y)), 1)
    out = _pbs(sk, any_ne, _lut(sk.params, _lut_table(sk.params, lambda v: 0 if v else 1)))
    return si.Ciphertext(ct=out, params=sk.params, degree=1, noise_level=1)


def ne(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext):
    e = eq(sk, a, b)
    table = _lut_table(sk.params, lambda v: 0 if v else 1)
    out = _pbs(sk, e.ct, _lut(sk.params, table))
    return si.Ciphertext(ct=out, params=sk.params, degree=1, noise_level=1)


def _compare_sign(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext) -> jax.Array:
    """Per-ciphertext trichotomy block: 0 if a<b, 1 if a==b, 2 if a>b."""

    def tri(x, y):
        return 0 if x < y else (1 if x == y else 2)

    c = _bivariate_blocks(sk, a, b, tri)
    # combine MSB-first: result = hi if hi != 1 else lo
    items = [c.blocks[..., i, :] for i in range(c.nblocks - 1, -1, -1)]

    def combine(hi, lo):
        return hi if hi != 1 else lo

    return _tree_reduce_blocks(sk, items, combine, 2)


def _sign_to_bool(sk: ServerKey, sign: jax.Array, pred: Callable):
    table = _lut_table(sk.params, lambda v: 1 if pred(v) else 0)
    out = _pbs(sk, sign, _lut(sk.params, table))
    return si.Ciphertext(ct=out, params=sk.params, degree=1, noise_level=1)


def lt(sk, a, b):
    return _sign_to_bool(sk, _compare_sign(sk, a, b), lambda s: s == 0)


def le(sk, a, b):
    return _sign_to_bool(sk, _compare_sign(sk, a, b), lambda s: s != 2)


def gt(sk, a, b):
    return _sign_to_bool(sk, _compare_sign(sk, a, b), lambda s: s == 2)


def ge(sk, a, b):
    return _sign_to_bool(sk, _compare_sign(sk, a, b), lambda s: s != 0)


# -- select / min / max -------------------------------------------------------------------


def select(
    sk: ServerKey, cond: si.Ciphertext, a: RadixCiphertext, b: RadixCiphertext
) -> RadixCiphertext:
    """cond ? a : b, cond a 0/1 block (reference FHE.select; fhevm manual
    test suite). Two stacked bivariate PBS per block batch + add."""
    p = sk.params
    m = p.message_modulus
    a = _fresh(sk, a)
    b = _fresh(sk, b)
    nb = a.nblocks
    cond_b = jnp.broadcast_to(cond.ct[..., None, :], a.blocks.shape)
    if all(d == 0 for d in b.degrees):
        # select vs a trivial zero (the ERC20 `moved` gate): one
        # bivariate PBS per block instead of two + add
        packed = cond_b * U64(m) + a.blocks
        ta = _lut_table(p, lambda v: (v % m) if (v // m) == 1 else 0)
        out = _pbs(sk, packed, _lut(p, ta))
        return RadixCiphertext(blocks=out, params=p, degrees=(m - 1,) * nb)
    if all(d == 0 for d in a.degrees):
        packed = cond_b * U64(m) + b.blocks
        tb = _lut_table(p, lambda v: (v % m) if (v // m) == 0 else 0)
        out = _pbs(sk, packed, _lut(p, tb))
        return RadixCiphertext(blocks=out, params=p, degrees=(m - 1,) * nb)
    packed_a = cond_b * U64(m) + a.blocks
    packed_b = cond_b * U64(m) + b.blocks
    ta = _lut_table(p, lambda v: (v % m) if (v // m) == 1 else 0)
    tb = _lut_table(p, lambda v: (v % m) if (v // m) == 0 else 0)
    out_a, out_b = _stacked_pbs(sk, [packed_a, packed_b], [ta, tb])
    blocks = out_a + out_b
    # exactly one of the two terms is nonzero per block -> true max is m-1
    return RadixCiphertext(blocks=blocks, params=p, degrees=(m - 1,) * nb)


def min_(sk, a, b):
    c = lt(sk, a, b)
    return select(sk, c, a, b)


def max_(sk, a, b):
    c = lt(sk, a, b)
    return select(sk, c, b, a)


# -- shifts / rotates (clear amount) --------------------------------------------------------


def _shift_blocks(sk: ServerKey, a: RadixCiphertext, r: int, rotate: bool, left: bool) -> RadixCiphertext:
    p = sk.params
    m = p.message_modulus
    bpb = _bits_per_block(p)
    nb = a.nblocks
    # fhevm/tfhe-rs semantics: shift and rotate amounts reduce mod nbits
    r = r % a.nbits
    q, rr = divmod(r, bpb)
    a = _fresh(sk, a)
    blocks = [a.blocks[..., i, :] for i in range(nb)]
    zero = jnp.zeros_like(blocks[0])

    def get(i):
        if rotate:
            return blocks[i % nb]
        return blocks[i] if 0 <= i < nb else zero

    # block-level move
    if left:
        moved = [get(i - q) for i in range(nb)]
    else:
        moved = [get(i + q) for i in range(nb)]
    if rr == 0:
        return RadixCiphertext(
            blocks=jnp.stack(moved, axis=-2), params=p, degrees=(m - 1,) * nb
        )
    # sub-block shift: combine adjacent blocks with a bivariate LUT
    if left:
        lowers = [get(i - q - 1) for i in range(nb)]
        f = lambda cur, low: ((cur << rr) | (low >> (bpb - rr))) % m
        pairs = [moved[i] * U64(m) + lowers[i] for i in range(nb)]
        table = _lut_table(p, lambda v: f(v // m, v % m))
    else:
        uppers = [get(i + q + 1) for i in range(nb)]
        f = lambda cur, up: ((cur >> rr) | ((up << (bpb - rr)) % m))
        pairs = [moved[i] * U64(m) + uppers[i] for i in range(nb)]
        table = _lut_table(p, lambda v: f(v // m, v % m))
    stacked = jnp.stack(pairs, axis=-2)
    out = _pbs(sk, stacked, _lut(p, table))
    return RadixCiphertext(blocks=out, params=p, degrees=(m - 1,) * nb)


def shl(sk, a, r: int):
    return _shift_blocks(sk, a, r, rotate=False, left=True)


def shr(sk, a, r: int):
    return _shift_blocks(sk, a, r, rotate=False, left=False)


def rotl(sk, a, r: int):
    return _shift_blocks(sk, a, r, rotate=True, left=True)


def rotr(sk, a, r: int):
    return _shift_blocks(sk, a, r, rotate=True, left=False)


# -- bit extraction / encrypted-amount shifts / division ---------------------------------------


def extract_bits(sk: ServerKey, a: RadixCiphertext) -> list:
    """All nbits bits of `a` as fresh 0/1 blocks (LSB first), via one
    stacked PBS over (block, bit-position) pairs."""
    p = sk.params
    bpb = _bits_per_block(p)
    a = _fresh(sk, a)
    cts = []
    tables = []
    for i in range(a.nblocks):
        for r in range(bpb):
            cts.append(a.blocks[..., i, :])
            tables.append(_lut_table(p, lambda v, r=r: (v >> r) & 1))
    outs = _stacked_pbs(sk, cts, tables)
    return outs  # list of (..., kN+1), values in {0,1}


def _select_bit(sk: ServerKey, bit, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
    cond = si.Ciphertext(ct=bit, params=sk.params, degree=1, noise_level=1)
    return select(sk, cond, a, b)


def _encrypted_shift(sk: ServerKey, a: RadixCiphertext, amt: RadixCiphertext, kind: str) -> RadixCiphertext:
    """Barrel shifter: for each bit k of the (mod nbits) amount, select
    between the current value and its 2^k-shifted version. log2(nbits)
    select rounds, each one stacked-PBS batch."""
    import math as _math

    nbits = a.nbits
    n_amt_bits = int(_math.log2(nbits))
    assert 2**n_amt_bits == nbits, "nbits must be a power of two"
    bits = extract_bits(sk, amt)[:n_amt_bits]  # amount mod nbits
    shift_f = {"shl": shl, "shr": shr, "rotl": rotl, "rotr": rotr}[kind]
    cur = _fresh(sk, a)
    for k, bit in enumerate(bits):
        shifted = shift_f(sk, cur, 1 << k)
        cur = _select_bit(sk, bit, shifted, cur)
    return cur


def shl_enc(sk, a, amt):
    return _encrypted_shift(sk, a, amt, "shl")


def shr_enc(sk, a, amt):
    return _encrypted_shift(sk, a, amt, "shr")


def rotl_enc(sk, a, amt):
    return _encrypted_shift(sk, a, amt, "rotl")


def rotr_enc(sk, a, amt):
    return _encrypted_shift(sk, a, amt, "rotr")


def div_rem(sk: ServerKey, a: RadixCiphertext, b: RadixCiphertext):
    """Restoring division: (quotient, remainder), unsigned.

    Bit-serial: nbits rounds of R <- 2R + bit, compare, conditional
    subtract. Division by zero follows tfhe-rs semantics: quotient all
    ones, remainder = dividend (falls out of the restoring loop since
    R >= 0 always holds).
    """
    p = sk.params
    m = p.message_modulus
    nbits = a.nbits
    wide = nbits + 2 * _bits_per_block(p)  # headroom for the 2R+1 step
    bits = extract_bits(sk, a)  # LSB first
    d = cast(sk, _fresh(sk, b), wide)
    r = trivial_radix(p, jnp.zeros(a.batch_shape, dtype=U64), wide)
    q_bits = []
    zero_block = jnp.zeros_like(bits[0])
    for i in range(nbits - 1, -1, -1):
        # R = 2R + bit_i
        r2 = shl(sk, r, 1)
        bit_radix = RadixCiphertext(
            blocks=jnp.concatenate(
                [bits[i][..., None, :]]
                + [zero_block[..., None, :]] * (r2.nblocks - 1),
                axis=-2,
            ),
            params=p,
            degrees=(1,) + (0,) * (r2.nblocks - 1),
        )
        r2 = add(sk, r2, bit_radix)
        c = ge(sk, r2, d)  # 0/1 block
        r = select(sk, c, sub(sk, r2, d), r2)
        q_bits.append((i, c.ct))
    # assemble quotient: block j = bit_{2j} + 2*bit_{2j+1} (linear, no PBS)
    bpb = _bits_per_block(p)
    nb = blocks_for_bits(p, nbits)
    qb = {i: ct for i, ct in q_bits}
    blocks = []
    for j in range(nb):
        blk = qb[j * bpb]
        for t in range(1, bpb):
            blk = blk + qb[j * bpb + t] * U64(1 << t)
        blocks.append(blk)
    quot = RadixCiphertext(
        blocks=jnp.stack(blocks, axis=-2), params=p, degrees=(m - 1,) * nb
    )
    rem = cast(sk, r, nbits)
    return quot, rem


def div(sk, a, b):
    return div_rem(sk, a, b)[0]


def rem(sk, a, b):
    return div_rem(sk, a, b)[1]


def scalar_div(sk, a, s: int):
    return div(sk, a, _scalar_ct(sk, a, s))


def scalar_rem(sk, a, s: int):
    return rem(sk, a, _scalar_ct(sk, a, s))


# -- casts ------------------------------------------------------------------------------------


def cast(sk: ServerKey, a: RadixCiphertext, nbits: int) -> RadixCiphertext:
    """Zero-extend or truncate (fhevm asEuintX semantics for unsigned)."""
    p = sk.params
    nb_new = blocks_for_bits(p, nbits)
    a = _fresh(sk, a)
    if nb_new == a.nblocks:
        return a
    if nb_new < a.nblocks:
        return RadixCiphertext(
            blocks=a.blocks[..., :nb_new, :],
            params=p,
            degrees=a.degrees[:nb_new],
        )
    pad = jnp.zeros(a.batch_shape + (nb_new - a.nblocks, a.blocks.shape[-1]), dtype=U64)
    return RadixCiphertext(
        blocks=jnp.concatenate([a.blocks, pad], axis=-2),
        params=p,
        degrees=a.degrees + (0,) * (nb_new - a.nblocks),
    )


# -- scalar variants ----------------------------------------------------------------------------


def _scalar_ct(sk: ServerKey, a: RadixCiphertext, s: int) -> RadixCiphertext:
    s = s % (1 << a.nbits)
    return trivial_radix(sk.params, jnp.full(a.batch_shape, s, dtype=U64), a.nbits)


def scalar_mul(sk, a, s: int):
    return mul(sk, a, _scalar_ct(sk, a, s))


def scalar_bitand(sk, a, s: int):
    return bitand(sk, a, _scalar_ct(sk, a, s))


def scalar_bitor(sk, a, s: int):
    return bitor(sk, a, _scalar_ct(sk, a, s))


def scalar_bitxor(sk, a, s: int):
    return bitxor(sk, a, _scalar_ct(sk, a, s))


def scalar_eq(sk, a, s: int):
    return eq(sk, a, _scalar_ct(sk, a, s))


def scalar_ne(sk, a, s: int):
    return ne(sk, a, _scalar_ct(sk, a, s))


def scalar_lt(sk, a, s: int):
    return lt(sk, a, _scalar_ct(sk, a, s))


def scalar_le(sk, a, s: int):
    return le(sk, a, _scalar_ct(sk, a, s))


def scalar_gt(sk, a, s: int):
    return gt(sk, a, _scalar_ct(sk, a, s))


def scalar_ge(sk, a, s: int):
    return ge(sk, a, _scalar_ct(sk, a, s))


def scalar_min(sk, a, s: int):
    return min_(sk, a, _scalar_ct(sk, a, s))


def scalar_max(sk, a, s: int):
    return max_(sk, a, _scalar_ct(sk, a, s))
