"""Distributed PBS on an 8-device virtual CPU mesh: sharded outputs must be
bit-identical to the single-device reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu import params
from tfhe_tpu.models import shortint as si
from tfhe_tpu.parallel import PbsDispatcher, make_mesh, make_sharded_pbs_step
from tfhe_tpu.rng import FheRng

P = params.TOY_SHORTINT
U64 = jnp.uint64


@pytest.fixture(scope="module")
def keys():
    return si.keygen(P, seed=51)


def _identity_lut():
    return si.generate_lut(P, np.arange(16, dtype=np.uint64))


@pytest.mark.parametrize("n_model", [1, 2, 4])
def test_sharded_pbs_matches_reference(keys, n_model):
    ck, sk = keys
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_model=n_model)
    engine = si.engine_for(P)
    step = make_sharded_pbs_step(mesh, engine, P.ks, P.pbs, bsk_shift=sk.bsk.shift)

    rng = FheRng(61)
    vals = jnp.asarray(np.arange(16).repeat(2), dtype=U64)  # B=32
    c = si.encrypt(ck, vals, rng)
    lut = _identity_lut()

    got = step(c.ct, lut, sk.bsk.bsk_ntt, sk.ksk.ksk)
    ref = si.apply_lut(sk, c, lut, out_degree=3).ct
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # and it decrypts correctly
    out = si.Ciphertext(ct=got, params=P, degree=3, noise_level=1)
    np.testing.assert_array_equal(np.asarray(si.decrypt(ck, out)), np.asarray(vals))


def test_dispatcher_pads_and_routes(keys):
    ck, sk = keys
    rng = FheRng(62)
    ident = np.arange(16, dtype=np.uint64)
    double = (np.arange(16, dtype=np.uint64) * 2) % 16

    def run_batch(cts, lut_table):
        lut = si.generate_lut(P, lut_table)
        from tfhe_tpu.core.lwe import keyswitch
        from tfhe_tpu.core.bootstrap import programmable_bootstrap

        small = keyswitch(cts, sk.ksk)
        return programmable_bootstrap(small, lut, sk.bsk, si.engine_for(P))

    d = PbsDispatcher(run_batch, bucket_sizes=(4, 16))
    vals = [0, 1, 2, 3, 7]
    tickets = []
    for i, v in enumerate(vals):
        c = si.encrypt(ck, jnp.asarray(v, dtype=U64), rng)
        table = ident if i % 2 == 0 else double
        tickets.append((d.submit(c.ct, table), v, i % 2 == 0))
    for t, v, is_ident in tickets:
        out = si.Ciphertext(ct=d.result(t), params=P, degree=15, noise_level=1)
        expect = v if is_ident else (2 * v) % 16
        assert int(si.decrypt(ck, out)) == expect
    assert d.stats["batches"] == 2  # one per distinct LUT
    assert d.stats["padded"] > 0  # buckets padded
