"""API layer: types, handles (keccak), inputs, ACL, instance op surface."""

import numpy as np
import pytest

from tfhe_tpu import params
from tfhe_tpu.api import FHE_TYPES, FhevmHandle, create_instance, type_from_bits
from tfhe_tpu.utils.keccak import keccak256


def test_keccak_vectors():
    # the canonical Ethereum empty-input keccak256
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block input (> 136-byte rate)
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 200).hex()
    assert keccak256(b"a" * 200) != keccak256(b"a" * 201)


def test_type_registry_matches_reference_ids():
    # reference FheType.ts:17-78
    assert FHE_TYPES["ebool"].type_id == 0
    assert FHE_TYPES["euint8"].type_id == 2
    assert FHE_TYPES["euint256"].type_id == 8
    assert FHE_TYPES["eaddress"].type_id == 7
    assert type_from_bits(64).name == "euint64"


def test_handle_roundtrip():
    h = FhevmHandle.from_ciphertext_blob(b"blob", 3, 5, chain_id=31337)
    b = h.to_bytes32()
    assert len(b) == 32
    back = FhevmHandle.from_bytes32(b)
    assert back == h
    assert back.type_id == 5 and back.index == 3 and back.chain_id == 31337
    assert FhevmHandle.parse(h.hex()) == h


@pytest.fixture(scope="module")
def inst():
    return create_instance(params.TOY_SHORTINT, seed=17)


CONTRACT = "0x" + "11" * 20
USER = "0x" + "22" * 20


def test_input_flow_and_user_decrypt(inst):
    inp = inst.create_encrypted_input(CONTRACT, USER)
    res = inp.add8(42).add_bool(True).add16(1000).encrypt()
    assert len(res["handles"]) == 3
    vals = inst.user_decrypt([(h, CONTRACT) for h in res["handles"]], USER)
    assert vals == [42, 1, 1000]


def test_acl_gates_decryption(inst):
    res = inst.create_encrypted_input(CONTRACT, USER).add8(7).encrypt()
    h = res["handles"][0]
    with pytest.raises(PermissionError):
        inst.public_decrypt([h])
    inst.acl.allow_for_decryption(h)
    assert inst.public_decrypt([h]) == {"0x" + h.hex(): 7}
    with pytest.raises(PermissionError):
        inst.user_decrypt([(h, CONTRACT)], "0x" + "33" * 20)


def test_input_caps(inst):
    inp = inst.create_encrypted_input(CONTRACT, USER)
    for _ in range(8):
        inp.add256(1)
    with pytest.raises(ValueError):
        inp.add8(1)  # 8*256 = 2048 bits exhausted


def test_fhe_op_surface(inst):
    b = inst.create_encrypted_input(CONTRACT, USER).add8(20).add8(30).encrypt()
    h1, h2 = b["handles"]
    hsum = inst.fhe_op("add", h1, h2)
    hcmp = inst.fhe_op("lt", h1, h2)
    hsel = inst.fhe_op("select", hcmp, h1, h2)
    hsc = inst.fhe_op("add", h1, 100)
    for h in [hsum, hcmp, hsel, hsc]:
        inst.acl.allow_for_decryption(h)
    assert inst.public_decrypt([hsum])["0x" + hsum.hex()] == 50
    assert inst.public_decrypt([hcmp])["0x" + hcmp.hex()] == 1
    assert inst.public_decrypt([hsel])["0x" + hsel.hex()] == 20
    assert inst.public_decrypt([hsc])["0x" + hsc.hex()] == 120


def test_rand_op(inst):
    h = inst.fhe_op("rand", "euint8")
    inst.acl.allow_for_decryption(h)
    v = inst.public_decrypt([h])["0x" + h.hex()]
    assert 0 <= v < 256
    h2 = inst.fhe_op("rand", "euint8", 10)
    inst.acl.allow_for_decryption(h2)
    assert 0 <= inst.public_decrypt([h2])["0x" + h2.hex()] < 10


def test_serialization_roundtrip(inst):
    from tfhe_tpu.utils.serialization import deserialize, serialize
    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.rng import FheRng
    import jax.numpy as jnp

    c = ri.encrypt_radix(inst._ck, jnp.asarray([7, 8], dtype=jnp.uint64), 8, FheRng(5))
    blob = serialize(c)
    back = deserialize(blob)
    assert isinstance(back, ri.RadixCiphertext)
    assert back.degrees == c.degrees
    np.testing.assert_array_equal(np.asarray(back.blocks), np.asarray(c.blocks))
    got = np.asarray(ri.decrypt_radix(inst._ck, back))
    np.testing.assert_array_equal(got, [7, 8])


def test_serialization_size_cap():
    from tfhe_tpu.utils.serialization import SerializationError, deserialize, serialize
    import jax.numpy as jnp

    x = jnp.zeros((1000,), dtype=jnp.uint64)
    blob = serialize(x)
    with pytest.raises(SerializationError):
        serialize(x, max_size=100)
    with pytest.raises(SerializationError):
        deserialize(blob, max_size=100)
    with pytest.raises(SerializationError):
        deserialize(b"garbage" + blob)
