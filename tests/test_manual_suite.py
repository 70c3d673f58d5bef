"""The reference's manual suite shapes (FHEVMManualTestSuite /
manual.ts): select over euint/ebool/eaddress, eaddress eq/ne incl.
scalar variants, ebool casts, ebytes eq/select (slow tier -- hundreds of
blocks per value)."""

import numpy as np
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.api.instance import create_instance

A1 = 0x8BA1F109551BD432803012645AC136DDD64DBA72
A2 = 0x8881F109551BD432803012645AC136DDD64DBA72


@pytest.fixture(scope="module")
def inst():
    return create_instance(tp.TOY_SHORTINT_CORPUS, seed=21)


def _enc(inst, tname, v):
    b = inst.create_encrypted_input("0x" + "11" * 20, "0x" + "22" * 20)
    getattr(b, {
        "ebool": "add_bool", "euint32": "add32", "eaddress": "add_address",
        "ebytes64": "add_bytes64", "ebytes128": "add_bytes128",
        "ebytes256": "add_bytes256",
    }[tname])(v)
    return b.encrypt()["handles"][0]


def test_select_euint32(inst):
    c = _enc(inst, "ebool", True)
    a = _enc(inst, "euint32", 3)
    b = _enc(inst, "euint32", 4)
    assert inst._decrypt_handle(inst.fhe_op("select", c, a, b)) == 3
    c0 = _enc(inst, "ebool", False)
    assert inst._decrypt_handle(inst.fhe_op("select", c0, a, b)) == 4


def test_select_eaddress(inst):
    c = _enc(inst, "ebool", True)
    a = _enc(inst, "eaddress", hex(A1))
    b = _enc(inst, "eaddress", hex(A2))
    assert inst._decrypt_handle(inst.fhe_op("select", c, a, b)) == A1
    c0 = _enc(inst, "ebool", False)
    assert inst._decrypt_handle(inst.fhe_op("select", c0, a, b)) == A2


def test_eaddress_eq_ne(inst):
    a = _enc(inst, "eaddress", hex(A1))
    a2 = _enc(inst, "eaddress", hex(A1))
    b = _enc(inst, "eaddress", hex(A2))
    assert inst._decrypt_handle(inst.fhe_op("eq", a, a2)) == 1
    assert inst._decrypt_handle(inst.fhe_op("eq", a, b)) == 0
    assert inst._decrypt_handle(inst.fhe_op("ne", a, b)) == 1
    assert inst._decrypt_handle(inst.fhe_op("ne", a, a2)) == 0


def test_eaddress_eq_scalar_variants(inst):
    """manual.ts 'eaddress eq scalar address,eaddress' both sides."""
    a = _enc(inst, "eaddress", hex(A1))
    assert inst._decrypt_handle(inst.fhe_op("eq", a, A1)) == 1  # ScalarR
    assert inst._decrypt_handle(inst.fhe_op("eq", a, A2)) == 0
    assert inst._decrypt_handle(inst.fhe_op("eq", A1, a)) == 1  # ScalarL
    assert inst._decrypt_handle(inst.fhe_op("ne", A2, a)) == 1


def test_ebool_to_euint_casts(inst):
    t = _enc(inst, "ebool", True)
    f = _enc(inst, "ebool", False)
    for target in ("euint8", "euint16", "euint32", "euint64"):
        assert inst._decrypt_handle(inst.fhe_op("cast", t, target)) == 1
        assert inst._decrypt_handle(inst.fhe_op("cast", f, target)) == 0


def test_ebytes64_eq_and_select(inst):
    v1 = bytes.fromhex("6798aa6bb8166128b0e7a16f60dc255c953288d03107895b0904ea18f7a242bf335fbabb".rjust(128, "0"))
    v2 = (0x42).to_bytes(64, "big")
    a = _enc(inst, "ebytes64", v1)
    a2 = _enc(inst, "ebytes64", v1)
    b = _enc(inst, "ebytes64", v2)
    assert inst._decrypt_handle(inst.fhe_op("eq", a, a2)) == 1
    assert inst._decrypt_handle(inst.fhe_op("eq", a, b)) == 0
    c = _enc(inst, "ebool", True)
    got = inst._decrypt_handle(inst.fhe_op("select", c, a, b))
    assert got == int.from_bytes(v1, "big")


def test_ebytes128_eq_ne_select(inst):
    """manual.ts ebytes128 eq/ne + select (VERDICT item 6: the upper
    ebytes widths join the default gate; ebytes256 stays in slow)."""
    import numpy as np

    rng = np.random.default_rng(31)
    v1 = rng.bytes(128)
    v2 = rng.bytes(128)
    a = _enc(inst, "ebytes128", v1)
    a2 = _enc(inst, "ebytes128", v1)
    b = _enc(inst, "ebytes128", v2)
    assert inst._decrypt_handle(inst.fhe_op("eq", a, a2)) == 1
    assert inst._decrypt_handle(inst.fhe_op("ne", a, b)) == 1
    assert inst._decrypt_handle(inst.fhe_op("eq", a, b)) == 0
    c = _enc(inst, "ebool", False)
    got = inst._decrypt_handle(inst.fhe_op("select", c, a, b))
    assert got == int.from_bytes(v2, "big")


def test_ebytes256_eq_ne(inst):
    """ebytes256 eq/ne in the DEFAULT tier (VERDICT r4 item 8: every
    type in api/types.py gets default-tier assertions; manual.ts runs
    the ebytes256 cases unconditionally)."""
    import numpy as np

    rng = np.random.default_rng(37)
    v1 = rng.bytes(256)
    v2 = rng.bytes(256)
    a = _enc(inst, "ebytes256", v1)
    a2 = _enc(inst, "ebytes256", v1)
    b = _enc(inst, "ebytes256", v2)
    assert inst._decrypt_handle(inst.fhe_op("eq", a, a2)) == 1
    assert inst._decrypt_handle(inst.fhe_op("ne", a, b)) == 1


@pytest.mark.slow
def test_ebytes256_select(inst):
    import numpy as np

    rng = np.random.default_rng(41)
    v1 = rng.bytes(256)
    v2 = rng.bytes(256)
    a = _enc(inst, "ebytes256", v1)
    b = _enc(inst, "ebytes256", v2)
    c = _enc(inst, "ebool", True)
    got = inst._decrypt_handle(inst.fhe_op("select", c, a, b))
    assert got == int.from_bytes(v1, "big")
