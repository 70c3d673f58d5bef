"""NTT-stage collectives + key-sharded blind rotation on the 8-device
virtual mesh: bit-identical to the single-device engine (VERDICT
round-1 item 9; SURVEY §2 parallelism rows (b)-(c))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tfhe_tpu import params as tp
from tfhe_tpu.core.bootstrap import blind_rotate, gen_bootstrap_key
from tfhe_tpu.core.keys import (
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe, sample_extract
from tfhe_tpu.models import shortint as si
from tfhe_tpu.models.glwe_matmul import get_engine
from tfhe_tpu.parallel.ntt_sharded import (
    make_key_sharded_blind_rotate,
    make_sharded_ntt,
)
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode, encode

U64 = jnp.uint64


def _mesh(n_model):
    devs = np.array(jax.devices()[:n_model])
    return Mesh(devs.reshape(n_model), ("model",))


@pytest.mark.parametrize("n_model", [4, 8])
@pytest.mark.parametrize("n_poly", [2048, 4096])
def test_sharded_forward_matches_engine(n_model, n_poly):
    engine = get_engine(n_poly)
    mesh = _mesh(n_model)
    fwd, _ = make_sharded_ntt(engine, mesh)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 1 << 63, n_poly, dtype=np.uint64))
    got = np.asarray(fwd(x))  # (P, N) canonical residues
    want = np.asarray(engine.forward_u64(x))  # (P, N) in [0, 2p)
    for i, ntt in enumerate(engine.ntts):
        np.testing.assert_array_equal(got[i] % ntt.p, want[i] % ntt.p)


@pytest.mark.parametrize("n_model", [4])
def test_sharded_roundtrip(n_model):
    engine = get_engine(2048)
    mesh = _mesh(n_model)
    fwd, inv = make_sharded_ntt(engine, mesh)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 20, 2048, dtype=np.uint64))
    f = fwd(x)
    back = np.asarray(inv(f))  # residues of x mod each prime
    for i, ntt in enumerate(engine.ntts):
        np.testing.assert_array_equal(back[i], np.asarray(x) % ntt.p)


@pytest.mark.parametrize("n_model", [4, 8])
def test_key_sharded_blind_rotate_bit_identical(n_model):
    """BSK sharded over the step axis: the ring-walked accumulator must
    equal the classic single-device scan EXACTLY."""
    P_ = tp.TOY_SHORTINT
    rng = FheRng(31)
    engine = si.engine_for(P_)
    lwe_sk = gen_lwe_secret_key(rng, P_.lwe_dimension)
    glwe_sk = gen_glwe_secret_key(rng, P_.glwe_dimension, P_.polynomial_size)
    bsk = gen_bootstrap_key(lwe_sk, glwe_sk, P_.pbs, rng.fork(), P_.glwe_noise, engine)

    table = np.asarray([(v * 3 + 1) % 4 for v in range(16)], dtype=np.uint64)
    lut = si.generate_lut(P_, table)
    msgs = jnp.asarray([1, 2, 5, 9], dtype=U64)
    ct = encrypt_lwe(lwe_sk, encode(msgs, P_.delta), rng.fork(), P_.lwe_noise)

    # classic single-device result (force the XLA scan path)
    engine_xla = engine
    use_pallas = getattr(engine_xla, "use_pallas", False)
    want = np.asarray(blind_rotate(lut, ct, bsk, engine_xla))

    mesh = _mesh(n_model)
    rotate = make_key_sharded_blind_rotate(
        engine, bsk.gadget, mesh, shift=bsk.shift
    )
    got = np.asarray(rotate(lut, ct, bsk.bsk_ntt))
    np.testing.assert_array_equal(got, want)

    # and it still decrypts to the right LUT outputs
    big_sk = glwe_to_lwe_secret_key(glwe_sk)
    out = sample_extract(jnp.asarray(got), 0)
    dec = np.asarray(decode(decrypt_lwe(big_sk, out), P_.delta, 16))
    np.testing.assert_array_equal(dec % 4, table[np.asarray(msgs)] % 4)
