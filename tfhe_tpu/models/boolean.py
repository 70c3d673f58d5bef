"""Boolean TFHE: gate bootstrapping over single bits.

BASELINE.json config 1 ("Boolean TFHE: single gate bootstrap (AND/XOR),
N=1024 GLWE"). Bits encode as +-1/8 of the torus; every binary gate is one
linear combination followed by a sign-test bootstrap and a keyswitch back
to the small key (the classic TFHE gate, PBS_KS order).

Ciphertexts are batched: and_(a, b) over shape (B, n+1) tensors is B gate
bootstraps in one device program -- the unit the batched-PBS dispatcher
feeds (SURVEY.md section 2, parallelism table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_tpu.core.bootstrap import (
    BootstrapKey,
    gen_bootstrap_key,
    programmable_bootstrap,
)
from tfhe_tpu.core.glwe import trivial_glwe
from tfhe_tpu.core.keys import (
    GlweSecretKey,
    LweSecretKey,
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import (
    KeyswitchKey,
    decrypt_lwe,
    encrypt_lwe,
    gen_keyswitch_key,
    keyswitch,
)
from tfhe_tpu.ops.folded_ntt import get_folded_engine as get_engine
from tfhe_tpu.params import BooleanParams
from tfhe_tpu.rng import FheRng
from tfhe_tpu.utils.pytree import pytree_dataclass

U64 = jnp.uint64
EIGHTH = U64(1) << U64(61)  # 1/8 of the torus


@pytree_dataclass(meta=("params",))
class ClientKey:
    glwe_key: GlweSecretKey
    lwe_key: LweSecretKey
    params: BooleanParams


@pytree_dataclass(meta=("params",))
class ServerKey:
    bsk: BootstrapKey
    ksk: KeyswitchKey  # big -> small, applied after each bootstrap
    params: BooleanParams


def keygen(params: BooleanParams, seed: int = 0) -> tuple[ClientKey, ServerKey]:
    rng = FheRng(seed)
    engine = get_engine(params.polynomial_size)
    glwe_sk = gen_glwe_secret_key(rng, params.glwe_dimension, params.polynomial_size)
    small_sk = gen_lwe_secret_key(rng, params.lwe_dimension)
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    bsk = gen_bootstrap_key(small_sk, glwe_sk, params.pbs, rng, params.glwe_noise, engine)
    ksk = gen_keyswitch_key(big_sk, small_sk, params.ks, rng, params.lwe_noise)
    return (
        ClientKey(glwe_key=glwe_sk, lwe_key=small_sk, params=params),
        ServerKey(bsk=bsk, ksk=ksk, params=params),
    )


def encrypt(ck: ClientKey, bits, rng: FheRng) -> jax.Array:
    """bits: (...,) in {0,1} -> ciphertexts (..., n+1) under the small key.
    Encoding: true -> +1/8, false -> -1/8."""
    bits = jnp.asarray(bits, dtype=U64)
    pt = jnp.where(bits != 0, EIGHTH, -EIGHTH)
    return encrypt_lwe(ck.lwe_key, pt, rng, ck.params.lwe_noise)


def decrypt(ck: ClientKey, ct: jax.Array) -> jax.Array:
    """Sign test: phase in (0, q/2) -> True."""
    phase = decrypt_lwe(ck.lwe_key, ct)
    return phase.astype(jnp.int64) > 0


def _gate_lut(params: BooleanParams) -> jax.Array:
    """Test polynomial with every coefficient = +1/8: blind rotation turns
    it into the sign function."""
    n = params.polynomial_size
    return trivial_glwe(jnp.full((n,), EIGHTH, dtype=U64), params.glwe_dimension)


def _bootstrap(sk: ServerKey, ct: jax.Array) -> jax.Array:
    engine = get_engine(sk.params.polynomial_size)
    big = programmable_bootstrap(ct, _gate_lut(sk.params), sk.bsk, engine)
    return keyswitch(big, sk.ksk)


def _const(ct_shape_like: jax.Array, v: jax.Array) -> jax.Array:
    """Add a plaintext constant to the body of an LWE ciphertext."""
    return ct_shape_like.at[..., -1].add(v)


def and_(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const(a + b, -EIGHTH))


def or_(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const(a + b, EIGHTH))


def nand(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const(-(a + b), EIGHTH))


def nor(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const(-(a + b), -EIGHTH))


def xor_(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const((a + b) * U64(2), U64(2) * EIGHTH))


def xnor(sk: ServerKey, a: jax.Array, b: jax.Array) -> jax.Array:
    return _bootstrap(sk, _const(-(a + b) * U64(2), -U64(2) * EIGHTH))


def not_(sk: ServerKey, a: jax.Array) -> jax.Array:
    """Free: torus negation flips the sign encoding. No bootstrap."""
    return -a


def mux(sk: ServerKey, c: jax.Array, t: jax.Array, f: jax.Array) -> jax.Array:
    """c ? t : f -- two AND-shaped bootstraps plus a recombining bootstrap
    (the classic TFHE MUX)."""
    d1 = _bootstrap(sk, _const(c + t, -EIGHTH))  # AND(c, t)
    d2 = _bootstrap(sk, _const(-c + f, -EIGHTH))  # AND(!c, f)
    return _bootstrap(sk, _const(d1 + d2, EIGHTH))
