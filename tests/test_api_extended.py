"""Extended API surface: ML-KEM user decrypt, div/rem/encrypted shifts
through the coprocessor op loop, ebytes type registry, encrypted pandas."""

import numpy as np
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.api import mlkem
from tfhe_tpu.api.instance import create_instance
from tfhe_tpu.api.types import FHE_TYPES, type_from_id


def test_mlkem_fips203_shapes_and_roundtrip():
    ek, dk = mlkem.keygen(seed=b"k" * 32)
    assert (len(ek), len(dk)) == (800, 1632)  # FIPS 203 ML-KEM-512
    k1, c = mlkem.encaps(ek, m=b"m" * 32)
    assert len(c) == 768
    assert mlkem.decaps(dk, c) == k1
    bad = bytes([c[0] ^ 1]) + c[1:]
    assert mlkem.decaps(dk, bad) != k1  # implicit rejection


def test_mlkem_ntt_matches_schoolbook():
    """NTT-domain product == negacyclic schoolbook product mod (X^256+1, q)."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, mlkem.Q, size=256)
    b = rng.integers(0, mlkem.Q, size=256)
    got = mlkem.ntt_inv(mlkem.ntt_mul(mlkem.ntt(a), mlkem.ntt(b)))
    ref = np.zeros(256, dtype=np.int64)
    for i in range(256):
        for j in range(256):
            k = i + j
            if k < 256:
                ref[k] = (ref[k] + a[i] * b[j]) % mlkem.Q
            else:
                ref[k - 256] = (ref[k - 256] - a[i] * b[j]) % mlkem.Q
    np.testing.assert_array_equal(got, ref)


def test_ebytes_types_registered():
    assert FHE_TYPES["ebytes64"].bits == 512
    assert FHE_TYPES["ebytes256"].bits == 2048
    assert type_from_id(11).name == "ebytes256"


@pytest.fixture(scope="module")
def inst():
    return create_instance(tp.TOY_SHORTINT, seed=5)


def test_div_rem_ops(inst):
    user, contract = "0x" + "1" * 40, "0x" + "2" * 40
    inp = inst.create_encrypted_input(contract, user)
    inp.add8(29)
    inp.add8(5)
    hs = inp.encrypt()["handles"]
    q = inst.fhe_op("div", hs[0], hs[1])
    r = inst.fhe_op("rem", hs[0], hs[1])
    qs = inst.fhe_op("div", hs[0], 4)
    inst.acl.allow_for_decryption(q)
    inst.acl.allow_for_decryption(r)
    inst.acl.allow_for_decryption(qs)
    out = inst.public_decrypt([q, r, qs])
    assert list(out.values()) == [29 // 5, 29 % 5, 29 // 4]


def test_encrypted_shift(inst):
    user, contract = "0x" + "1" * 40, "0x" + "2" * 40
    inp = inst.create_encrypted_input(contract, user)
    inp.add8(0b10110011)
    inp.add8(2)
    hs = inp.encrypt()["handles"]
    h = inst.fhe_op("shl", hs[0], hs[1])
    inst.acl.allow_for_decryption(h)
    (v,) = inst.public_decrypt([h]).values()
    assert v == (0b10110011 << 2) % 256


def test_user_decrypt_sealed_mlkem(inst):
    user, contract = "0x" + "3" * 40, "0x" + "4" * 40
    inp = inst.create_encrypted_input(contract, user)
    inp.add8(123)
    hs = inp.encrypt()["handles"]
    inst.acl.allow(hs[0], user)
    inst.acl.allow(hs[0], contract)
    kp = inst.generate_keypair()
    sealed = inst.user_decrypt_sealed([(hs[0], contract)], user, kp["publicKey"])
    assert inst.unseal(sealed[0], kp["privateKey"]) == 123


def test_encrypted_pandas_merge():
    import pandas as pd

    from tfhe_tpu.ml.pandas import DataFrameClient

    cl = DataFrameClient(seed=0, value_bits=4)
    left = pd.DataFrame({"k": [1, 2, 3], "a": [5, 6, 7]})
    right = pd.DataFrame({"k": [2, 3, 9], "b": [10, 11, 12]})
    merged = cl.encrypt_from_pandas(left).merge(
        cl.encrypt_from_pandas(right), on="k"
    )
    out = cl.decrypt_to_pandas(merged)
    exp = left.merge(right, on="k", how="left").fillna(0).astype(int)
    for col in ("k", "a", "b"):
        np.testing.assert_array_equal(out[col].values, exp[col].values)


def test_encrypted_pandas_save_load(tmp_path):
    import pandas as pd

    from tfhe_tpu.ml.pandas import DataFrameClient, EncryptedDataFrame

    cl = DataFrameClient(seed=1, value_bits=4)
    df = pd.DataFrame({"k": [1, 2], "v": [3, 4]})
    edf = cl.encrypt_from_pandas(df)
    p = str(tmp_path / "edf.bin")
    edf.save(p)
    back = EncryptedDataFrame.load(p, cl.sk)
    out = cl.decrypt_to_pandas(back)
    np.testing.assert_array_equal(out["v"].values, [3, 4])


def test_fhe_op_many_batched(inst):
    user, contract = "0x" + "5" * 40, "0x" + "6" * 40
    pairs = []
    vals = [(3, 9), (250, 10), (77, 77), (0, 255)]
    for a, b in vals:
        inp = inst.create_encrypted_input(contract, user)
        inp.add8(a)
        inp.add8(b)
        hs = inp.encrypt()["handles"]
        pairs.append((hs[0], hs[1]))
    adds = inst.fhe_op_many("add", pairs)
    eqs = inst.fhe_op_many("eq", pairs)
    scal = inst.fhe_op_many("add", [(p[0], 7) for p in pairs])
    for h in adds + eqs + scal:
        inst.acl.allow_for_decryption(h)
    got_add = [v for v in inst.public_decrypt(adds).values()]
    got_eq = [v for v in inst.public_decrypt(eqs).values()]
    got_sc = [v for v in inst.public_decrypt(scal).values()]
    assert got_add == [(a + b) % 256 for a, b in vals]
    assert got_eq == [int(a == b) for a, b in vals]
    assert got_sc == [(a + 7) % 256 for a, _ in vals]


def test_ebytes_eq_select(inst):
    user, contract = "0x" + "7" * 40, "0x" + "8" * 40
    b1 = bytes(range(64))
    b2 = bytes(range(64))
    b3 = b"\xff" * 64
    inp = inst.create_encrypted_input(contract, user)
    inp.add_bytes64(b1)
    hs1 = inp.encrypt()["handles"]
    inp = inst.create_encrypted_input(contract, user)
    inp.add_bytes64(b2)
    inp.add_bytes64(b3)
    hs2 = inp.encrypt()["handles"]
    h_eq = inst.fhe_op("eq", hs1[0], hs2[0])
    h_ne = inst.fhe_op("ne", hs1[0], hs2[1])
    sel = inst.fhe_op("select", h_eq, hs1[0], hs2[1])
    for h in (h_eq, h_ne, sel):
        inst.acl.allow_for_decryption(h)
    out = inst.public_decrypt([h_eq, h_ne, sel])
    vals = list(out.values())
    assert vals[0] == 1 and vals[1] == 1
    assert vals[2] == int.from_bytes(b1, "big")
