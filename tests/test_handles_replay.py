"""Deterministic result-handle derivation and replay parity.

The reference derives result handles as keccak hashes over the op and
operands (FhevmHandle.ts:203-215), so replaying an op sequence against a
fresh coprocessor reproduces identical handles -- the property on-chain
symbolic execution depends on. Round 1 used random handles; these tests
pin the fixed behavior.
"""

import pytest

from tfhe_tpu import params
from tfhe_tpu.api.handles import FhevmHandle
from tfhe_tpu.api.instance import create_instance


def _sequence(inst):
    """A representative op trace: inputs, arithmetic, compare, select,
    cast, scalar ops, rand."""
    b = inst.create_encrypted_input("0x" + "11" * 20, "0x" + "22" * 20)
    b.add8(7).add8(3)
    hs = b.encrypt()["handles"]
    h_add = inst.fhe_op("add", hs[0], hs[1])
    h_mul = inst.fhe_op("mul", h_add, hs[1])
    h_lt = inst.fhe_op("lt", hs[0], h_mul)
    h_sel = inst.fhe_op("select", h_lt, hs[0], hs[1])
    h_sc = inst.fhe_op("add", h_sel, 5)
    h_cast = inst.fhe_op("cast", h_sc, "euint16")
    h_not = inst.fhe_op("not", hs[0])
    h_rand = inst.fhe_op("rand", "euint8")
    return [h_add, h_mul, h_lt, h_sel, h_sc, h_cast, h_not, h_rand]


def test_replay_identical_handles():
    a = create_instance(params.TOY_SHORTINT, seed=7)
    b = create_instance(params.TOY_SHORTINT, seed=7)
    ha, hb = _sequence(a), _sequence(b)
    assert ha == hb


def test_same_op_same_operands_idempotent():
    inst = create_instance(params.TOY_SHORTINT, seed=7)
    b = inst.create_encrypted_input("0x" + "11" * 20, "0x" + "22" * 20)
    b.add8(7).add8(3)
    hs = b.encrypt()["handles"]
    h1 = inst.fhe_op("add", hs[0], hs[1])
    h2 = inst.fhe_op("add", hs[0], hs[1])
    assert h1 == h2
    # different operand order / different op -> different handle
    assert inst.fhe_op("add", hs[1], hs[0]) != h1
    assert inst.fhe_op("mul", hs[0], hs[1]) != h1
    # scalar vs handle operands are domain-separated
    assert inst.fhe_op("add", hs[0], 3) != h1


def test_handle_layout_fields():
    inst = create_instance(params.TOY_SHORTINT, seed=3, chain_id=4242)
    b = inst.create_encrypted_input("0x" + "11" * 20, "0x" + "22" * 20)
    b.add32(9)
    hs = b.encrypt()["handles"]
    h = inst.fhe_op("add", hs[0], 1)
    parsed = FhevmHandle.from_bytes32(h)
    assert parsed.chain_id == 4242
    assert parsed.type_id == 4  # euint32
    # the hash21 must NOT be constant across ops
    h2 = inst.fhe_op("add", hs[0], 2)
    assert FhevmHandle.from_bytes32(h2).hash21 != parsed.hash21


def test_rand_deterministic_per_seed():
    a = create_instance(params.TOY_SHORTINT, seed=11)
    b = create_instance(params.TOY_SHORTINT, seed=11)
    c = create_instance(params.TOY_SHORTINT, seed=12)
    ha = [a.fhe_op("rand", "euint8") for _ in range(3)]
    hb = [b.fhe_op("rand", "euint8") for _ in range(3)]
    hc = [c.fhe_op("rand", "euint8") for _ in range(3)]
    # handles are SYMBOLIC: they depend on the op trace, not the seed
    # (on-chain the handle is derived before the coprocessor runs)
    assert ha == hb == hc
    # the stream advances: successive rands differ
    assert len(set(ha)) == 3
    va = [a._decrypt_handle(h) for h in ha]
    vb = [b._decrypt_handle(h) for h in hb]
    vc = [c._decrypt_handle(h) for h in hc]
    assert va == vb
    assert va != vc  # different seed -> different rand values


def test_decrypt_after_replay():
    """Replayed handles decrypt to the same values (full parity)."""
    a = create_instance(params.TOY_SHORTINT, seed=5)
    b = create_instance(params.TOY_SHORTINT, seed=5)
    for inst in (a, b):
        pass
    ha, hb = _sequence(a), _sequence(b)
    va = [a._decrypt_handle(h) for h in ha[:6]]
    vb = [b._decrypt_handle(h) for h in hb[:6]]
    assert va == vb
    assert va[0] == 10  # 7 + 3
    assert va[1] == (10 * 3) % 256
