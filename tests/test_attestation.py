"""Input-proof / attestation chain: EIP-712 quorum signatures over
recomputed handles, threshold verification, fail-closed negatives.

Reference behavior: sendEncryption.ts:328-441 (handle cross-check,
verifyTypedData per signature, isThresholdReached, proof assembly);
encrypt.ts:174-189 (auxData binding). Round 1 shipped a placeholder
proof; these tests pin the real chain.
"""

import pytest

from tfhe_tpu import params
from tfhe_tpu.api import attestation, secp256k1 as ec
from tfhe_tpu.api.client import FheClient
from tfhe_tpu.api.handles import FhevmHandle
from tfhe_tpu.api.instance import create_instance
from tfhe_tpu.api.serve import FheServer
from tfhe_tpu.utils.keccak import keccak256


@pytest.fixture(scope="module")
def inst():
    return create_instance(params.TOY_SHORTINT, seed=31)


CONTRACT = "0x" + "11" * 20
USER = "0x" + "22" * 20


def _encrypt_one(inst, v=7):
    b = inst.create_encrypted_input(CONTRACT, USER)
    b.add8(v)
    return b.encrypt()


# -- secp256k1 primitives ----------------------------------------------------


def test_secp256k1_known_vector():
    # address of the generator's private key 1 is a published constant
    assert ec.address(1) == "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf"


def test_sign_recover_roundtrip():
    d = keccak256(b"digest")
    for priv in (2, 3**50, 17**31):
        sig = ec.sign(priv, d)
        assert len(sig) == 65
        assert sig[64] in (27, 28)
        assert ec.recover_address(d, sig) == ec.address(priv)
        # low-s normalization (EIP-2)
        s = int.from_bytes(sig[32:64], "big")
        assert s <= ec.N // 2


# -- proof structure ---------------------------------------------------------


def test_proof_format_and_roundtrip(inst):
    res = _encrypt_one(inst)
    proof = res["inputProof"]
    handles, sigs, extra = attestation.parse_input_proof(proof)
    assert handles == res["handles"]
    assert len(sigs) == 4  # full quorum signs
    assert proof[0] == len(handles) and proof[1] == len(sigs)


def test_proof_verifies_against_discovered_signers(inst):
    res = _encrypt_one(inst)
    signers, threshold = inst.get_coprocessor_signers()
    assert threshold == 3 and len(signers) == 4
    attestation.verify_input_proof(
        res["inputProof"], res["handles"], signers, threshold,
        USER, CONTRACT, inst.chain_id, inst.coprocessor.verifying_contract,
    )


# -- fail-closed negatives ---------------------------------------------------


def _verify(inst, proof, handles, user=USER, contract=CONTRACT):
    signers, threshold = inst.get_coprocessor_signers()
    attestation.verify_input_proof(
        proof, handles, signers, threshold, user, contract,
        inst.chain_id, inst.coprocessor.verifying_contract,
    )


def test_tampered_signature_rejected(inst):
    res = _encrypt_one(inst)
    proof = bytearray(res["inputProof"])
    sig_off = 2 + 32 * proof[0]
    proof[sig_off + 10] ^= 0xFF
    with pytest.raises(attestation.InputProofError):
        _verify(inst, bytes(proof), res["handles"])


def test_below_threshold_rejected(inst):
    res = _encrypt_one(inst)
    handles = res["handles"]
    sigs = inst.coprocessor.sign_handles(
        handles, USER, CONTRACT, b"\x00", inst.chain_id, signers=[0, 1]
    )
    proof = attestation.assemble_input_proof(handles, sigs, b"\x00")
    with pytest.raises(attestation.InputProofError, match="threshold"):
        _verify(inst, proof, handles)


def test_duplicate_signer_not_counted(inst):
    res = _encrypt_one(inst)
    handles = res["handles"]
    sigs = inst.coprocessor.sign_handles(
        handles, USER, CONTRACT, b"\x00", inst.chain_id, signers=[0, 0, 0]
    )
    proof = attestation.assemble_input_proof(handles, sigs, b"\x00")
    with pytest.raises(attestation.InputProofError, match="duplicate"):
        _verify(inst, proof, handles)


def test_unknown_signer_rejected(inst):
    res = _encrypt_one(inst)
    handles = res["handles"]
    rogue = attestation.CoprocessorQuorum.generate(4, 3, b"rogue")
    rogue.verifying_contract = inst.coprocessor.verifying_contract
    sigs = rogue.sign_handles(handles, USER, CONTRACT, b"\x00", inst.chain_id)
    proof = attestation.assemble_input_proof(handles, sigs, b"\x00")
    with pytest.raises(attestation.InputProofError, match="unknown signer"):
        _verify(inst, proof, handles)


def test_wrong_aux_data_rejected(inst):
    """Signatures are bound to (user, contract, chainId): verifying under
    a different contract/user must fail (auxData binding,
    encrypt.ts:174-189)."""
    res = _encrypt_one(inst)
    with pytest.raises(attestation.InputProofError):
        _verify(inst, res["inputProof"], res["handles"], contract="0x" + "33" * 20)
    with pytest.raises(attestation.InputProofError):
        _verify(inst, res["inputProof"], res["handles"], user="0x" + "44" * 20)


def test_handle_mismatch_rejected(inst):
    res = _encrypt_one(inst)
    wrong = [b"\x00" * 32]
    with pytest.raises(attestation.InputProofError, match="handle mismatch"):
        _verify(inst, res["inputProof"], wrong)


def test_acl_address_bound_into_handles(inst):
    """Input handles bind auxData incl. the ACL address: a different ACL
    yields different handles for the same blob."""
    res = _encrypt_one(inst, v=9)
    h = FhevmHandle.from_bytes32(res["handles"][0])
    assert h.chain_id == inst.chain_id
    other = create_instance(params.TOY_SHORTINT, seed=31)
    other.acl_address = "0x" + "ff" * 20
    b = other.create_encrypted_input(CONTRACT, USER)
    b.add8(9)
    res2 = b.encrypt()
    assert res2["handles"][0] != res["handles"][0]


# -- over the wire -----------------------------------------------------------


def test_http_input_proof_and_verify(inst):
    srv = FheServer(inst).start()
    try:
        c = FheClient(f"http://127.0.0.1:{srv.port}")
        res = _encrypt_one(inst, v=5)
        hexh = ["0x" + h.hex() for h in res["handles"]]
        r = c._post(
            "/input-proof", {"handles": hexh, "user": USER, "contract": CONTRACT}
        )
        assert r["threshold"] == 3
        proof = bytes.fromhex(r["inputProof"])
        _verify(inst, proof, res["handles"])
        # /verify accepts the good proof and rejects a tampered one
        ok = c._post("/verify", {
            "handles": hexh, "inputProof": r["inputProof"],
            "user": USER, "contract": CONTRACT,
        })
        assert ok["valid"] is True
        bad = bytearray(proof)
        bad[40] ^= 1
        r2 = c._post("/verify", {
            "handles": hexh, "inputProof": bad.hex(),
            "user": USER, "contract": CONTRACT,
        })
        assert r2["valid"] is False
    finally:
        srv.stop()


def test_contract_chain_id_bound_into_struct(inst):
    """Advisor round-2: the EIP-712 struct must bind contractChainId
    (reference sendEncryption.ts:390-397) so two host chains sharing a
    gateway domain cannot replay each other's attestations."""
    from tfhe_tpu.api.attestation import ciphertext_verification_digest

    handles = [bytes([i]) * 32 for i in range(2)]
    common = dict(
        handles=handles, user=USER, contract=CONTRACT,
        extra_data=b"\x00", chain_id=inst.chain_id,
        verifying_contract="0x" + "69" * 20,
    )
    d_default = ciphertext_verification_digest(**common)
    d_same = ciphertext_verification_digest(
        **common, contract_chain_id=inst.chain_id
    )
    d_other = ciphertext_verification_digest(**common, contract_chain_id=777)
    assert d_default == d_same  # default: host chain == gateway chain
    assert d_default != d_other  # different host chain -> different digest
