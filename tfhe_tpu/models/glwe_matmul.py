"""GLWE encrypted-vector x clear-matrix multiplication engine.

TPU-native re-architecture of the reference's `concrete_ml_extensions`
matmul stack (reference: ml/extensions/rust/src/ml.rs EncryptedVector/dot,
encryption.rs delta encoding, fhext_classes.rs key/params classes,
lib_python.rs:176-431 the pyo3 API surface) -- the backend that
concrete-ml's GLWELinearLayerExecutor routes linear layers to (reference:
ml/concrete-ml/src/concrete/ml/quantization/linear_op_glwe_backend.py).

Scheme:
  * an input row v (length C) packs into ceil(C/N) GLWE polynomials,
    encoded at delta = 2^(64 - bits_reserved_for_computation);
  * dot(v, w) = negacyclic polymul against reverse(w) per chunk; the clean
    (wrap-free) coefficient N-1 accumulates the chunk dot product
    (reference computations.rs:60-107 lands the dot in the last coeff);
  * sample-extract coefficient N-1, sum chunk LWEs -> LWE(dot);
  * one-to-many: the ciphertext is forward-transformed ONCE and multiplied
    against all output columns in the NTT domain (the CUDA one-to-many
    path, ml.rs:66-91, as a batched tensor contraction);
  * results pack back into GLWEs via the packing keyswitch under a separate
    post-compression key, then modulus-switch to a narrow storage modulus
    (compression.rs:36-129 semantics).

Everything is batched over input rows and output columns in one program.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.core.glwe import decrypt_glwe, encrypt_glwe
from tfhe_tpu.core.keys import (
    GlweSecretKey,
    gen_glwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.packing import (
    PackingKeyswitchKey,
    gen_packing_keyswitch_key,
    packing_keyswitch,
)
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.ops.folded_ntt import get_folded_engine as get_engine
from tfhe_tpu.params import MatmulParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import mod_switch
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64


@pytree_dataclass(meta=("params",))
class MatmulPrivateKey:
    """Input GLWE key + post-compression GLWE key + packing keyswitch key
    (reference fhext_classes.rs PrivateKey / CompressionKey)."""

    glwe_key: GlweSecretKey
    post_key: GlweSecretKey
    pksk: PackingKeyswitchKey
    params: MatmulParams


@pytree_dataclass(meta=("params", "n_valid", "shape"))
class EncryptedMatrix:
    """glwes: (R, n_chunks, k+1, N) -- row r packed into chunk polynomials."""

    glwes: jax.Array
    params: MatmulParams
    n_valid: int  # C, the true inner dimension
    shape: tuple


@pytree_dataclass(meta=("params", "shape", "n_bits_out"))
class CompressedResultMatrix:
    """Packed + modulus-switched result: (R, n_out_chunks, k+1, N) stored
    at ct_modulus_out_bits (u32)."""

    data: jax.Array
    params: MatmulParams
    shape: tuple  # (R, O)
    n_bits_out: int


def default_params() -> MatmulParams:
    from tfhe_tpu import params as tp

    return tp.PARAMS_8B_2048


def create_private_key(params: MatmulParams, seed: int = 0) -> MatmulPrivateKey:
    rng = FheRng(seed)
    engine = get_engine(params.polynomial_size)
    glwe_key = gen_glwe_secret_key(rng, params.glwe_dimension, params.polynomial_size)
    post_key = gen_glwe_secret_key(rng, params.glwe_dimension, params.polynomial_size)
    big_lwe = glwe_to_lwe_secret_key(glwe_key)
    pksk = gen_packing_keyswitch_key(
        big_lwe, post_key, params.packing_ks, rng, params.packing_ks_noise, engine
    )
    return MatmulPrivateKey(
        glwe_key=glwe_key, post_key=post_key, pksk=pksk, params=params
    )


def _delta(params: MatmulParams) -> int:
    return 1 << (64 - params.bits_reserved_for_computation)


def encrypt_matrix(
    pkey: MatmulPrivateKey, matrix, rng: FheRng | None = None, seed: int = 1
) -> EncryptedMatrix:
    """matrix: (R, C) unsigned ints < 2^input_bits -> encrypted rows."""
    p = pkey.params
    n = p.polynomial_size
    if rng is None:
        rng = FheRng(seed)
    engine = get_engine(n)
    m = jnp.asarray(matrix, dtype=U64)
    r, c = m.shape
    n_chunks = -(-c // n)
    padded = jnp.zeros((r, n_chunks * n), dtype=U64).at[:, :c].set(m)
    pts = padded.reshape(r, n_chunks, n) * U64(_delta(p))
    glwes = encrypt_glwe(pkey.glwe_key, pts, rng, p.glwe_noise, engine)
    return EncryptedMatrix(glwes=glwes, params=p, n_valid=c, shape=(r, c))


@pytree_dataclass(meta=("params", "shape"))
class PreparedClearMatrix:
    """Device-resident NTT-domain clear operand with Shoup companions
    (the reference keeps matrices device-resident across calls,
    lib_python.rs:243-339). Built once by `prepare_clear_weights`;
    passing it to `matrix_multiplication` lets the matmul run under an
    enclosing jit with the weights as an ARGUMENT (not a baked-in
    constant riding every compile payload)."""

    f_w: jax.Array  # (O, n_chunks, P, 2, N) u32 Shoup pairs
    params: MatmulParams
    shape: tuple  # (C, O)


def prepare_clear_weights(
    params: MatmulParams, clear, n_valid: int | None = None
) -> PreparedClearMatrix:
    """Forward-transform a concrete clear weight matrix (C, O) once.

    Validates the CRT reconstruction bound eagerly (needs concrete
    values -- call outside jit)."""
    n = params.polynomial_size
    engine = get_engine(n)
    w = np.asarray(clear)
    c, o = w.shape
    n_chunks = -(-c // n)
    w_bits = engine.max_product_bits - 64 - max(
        0, math.ceil(math.log2(n_chunks))
    )
    if np.abs(w.astype(np.int64)).max(initial=0) >= (1 << w_bits):
        raise ValueError(
            f"prepare_clear_weights: |clear| entries must be < 2^{w_bits} "
            "at these parameters (CRT reconstruction range)"
        )
    pad = jnp.zeros((n_chunks * n, o), dtype=jnp.int64).at[:c, :].set(
        jnp.asarray(w, dtype=jnp.int64)
    )
    w_chunks = pad.reshape(n_chunks, n, o)
    w_rev = w_chunks[:, ::-1, :]  # reverse within chunk
    w_polys = jnp.moveaxis(w_rev, -1, 0)  # (O, n_chunks, N)
    f_w = engine.make_shoup(engine.forward_small(w_polys))
    return PreparedClearMatrix(f_w=f_w, params=params, shape=(c, o))


def matrix_multiplication(
    enc: EncryptedMatrix, clear, pkey: MatmulPrivateKey
) -> CompressedResultMatrix:
    """enc (R, C) x clear (C, O) -> compressed encrypted result (R, O).

    clear: either a small-signed-int matrix (quantized weights; must be
    concrete) or a PreparedClearMatrix from `prepare_clear_weights`
    (jit-argument friendly).
    """
    p = enc.params
    n = p.polynomial_size
    engine = get_engine(n)
    if isinstance(clear, PreparedClearMatrix):
        return _matmul_prepared(enc, clear, pkey, engine)
    # CRT exactness bound: each output coefficient is a sum over
    # n_chunks negacyclic convolutions of full-width ciphertext words
    # (< 2^64) against clear weights; the true integer magnitude must
    # stay under the engine's reconstruction range or Garner wraps into
    # garbage decrypts (measured: weights past this bound flip sign at
    # TOY N=256) -- validated inside prepare_clear_weights (the
    # reference budgets 27 bits for the whole input x weight product,
    # fhext_classes.rs:100-114).
    w = np.asarray(clear)
    c, o = w.shape
    assert c == enc.n_valid
    prep = prepare_clear_weights(p, w)
    return _matmul_prepared(enc, prep, pkey, engine)


def _matmul_prepared(
    enc: EncryptedMatrix,
    prep: PreparedClearMatrix,
    pkey: MatmulPrivateKey,
    engine,
) -> CompressedResultMatrix:
    p = enc.params
    n = p.polynomial_size
    c, o = prep.shape
    assert c == enc.n_valid
    r = enc.shape[0]

    # one-to-many: transform ciphertext once, weights once; the weights
    # are the fixed operand, so they carry the Shoup companions
    f_ct = engine.forward_u64(enc.glwes)  # (R, chunks, k+1, P, N)
    f_w = prep.f_w  # (O, chunks, P, 2, N)

    # product GLWE for (r, o): sum over chunks of ct_chunk * w_chunk
    prod = engine.pointwise_shoup(
        f_ct[:, None],  # (R, 1, chunks, k+1, P, N)
        f_w[None, :, :, None],  # (1, O, chunks, 1, P, 2, N)
    )  # (R, O, chunks, k+1, P, N) in [0, 2p)
    f = engine.reduce_u64_domain(
        jnp.sum(prod.astype(U64), axis=2)
    )  # (R, O, k+1, P, N) u32

    # extract the dot product at coefficient N-1 (reference
    # computations.rs:109-132 extracts the last coefficient). Only the
    # MASK polynomials need the full inverse transform (the packing
    # keyswitch decomposes every mask coefficient); the body contributes
    # a single coefficient, computed as one dot against a fixed inverse
    # row (engine.backward_coeff) -- this halves the dominant
    # inverse-NTT cost of the whole matmul at k=1.
    mask_coeffs = engine.backward(f[..., :-1, :, :])  # (R, O, k, N)
    body_n1 = engine.backward_coeff(f[..., -1, :, :], n - 1)  # (R, O)
    # sample_extract algebra at index N-1: src = N-1-i never wraps, so
    # the extracted mask is just each key polynomial reversed (no
    # negacyclic negation branch)
    k_dim = mask_coeffs.shape[-2]
    ext = mask_coeffs[..., ::-1]
    lwes = jnp.concatenate(
        [ext.reshape(r, o, k_dim * n), body_n1[..., None]], axis=-1
    )  # (R, O, kN+1)

    # pack rows of O LWEs into ceil(O/N) GLWEs under the post key
    n_out_chunks = -(-o // n)
    padded_o = n_out_chunks * n
    if padded_o != o:
        padf = jnp.zeros((r, padded_o - o, lwes.shape[-1]), dtype=U64)
        lwes = jnp.concatenate([lwes, padf], axis=1)
    lwes = lwes.reshape(r, n_out_chunks, n, -1)
    packed = packing_keyswitch(lwes, pkey.pksk, engine)  # (R, chunks, k+1, N)

    # modulus switch to the storage modulus
    stored = mod_switch(packed, p.ct_modulus_out_bits).astype(jnp.uint32)
    return CompressedResultMatrix(
        data=stored, params=p, shape=(r, o), n_bits_out=p.ct_modulus_out_bits
    )


def decrypt_matrix(
    result: CompressedResultMatrix, pkey: MatmulPrivateKey
) -> jax.Array:
    """Decrypt to signed int64 (results can be negative with signed
    weights; reference decrypt applies the signed wrap,
    encryption.rs:185-203)."""
    p = result.params
    n = p.polynomial_size
    engine = get_engine(n)
    r, o = result.shape
    # expand storage modulus back to q = 2^64
    ct = result.data.astype(U64) << U64(64 - result.n_bits_out)
    phase = decrypt_glwe(pkey.post_key, ct, engine)  # (R, chunks, N)
    phase = phase.reshape(r, -1)[:, :o]
    delta = _delta(p)
    vals = (phase + U64(delta // 2)) // U64(delta)
    space = 1 << p.bits_reserved_for_computation
    vals = vals % U64(space)
    sv = vals.astype(jnp.int64)
    return sv - jnp.where(sv >= space // 2, jnp.int64(space), jnp.int64(0))
