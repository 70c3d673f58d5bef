"""From-scratch ONNX frontend: wire-format parse + DAG lowering
(reference compile_onnx_model, compile.py:369 -- round 1 shipped a
raising stub; no `onnx` package exists in this image, so the test
fixtures are hand-encoded protobuf, which doubles as a wire-format
conformance check)."""

import struct

import numpy as np
import pytest

from tfhe_tpu.ml import onnx_frontend as of
from tfhe_tpu.ml.common import FheMode


# -- minimal protobuf ENCODER (test fixture builder) -------------------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b""
    for d in arr.shape:
        out += _tag(1, 0) + _varint(d)
    if arr.dtype == np.int64:
        out += _tag(2, 0) + _varint(7)
        raw = arr.astype("<i8").tobytes()
    else:
        out += _tag(2, 0) + _varint(1)
        raw = arr.astype("<f4").tobytes()
    out += _ld(8, name.encode())
    out += _ld(9, raw)
    return out


def _attr_i(name: str, v: int) -> bytes:
    return _ld(1, name.encode()) + _tag(3, 0) + _varint(v & (2**64 - 1))


def _attr_f(name: str, v: float) -> bytes:
    return _ld(1, name.encode()) + _tag(2, 5) + struct.pack("<f", v)


def _attr_ints(name: str, vals) -> bytes:
    packed = b"".join(_varint(v & (2**64 - 1)) for v in vals)
    return _ld(1, name.encode()) + _ld(8, packed)


def _node(op: str, inputs, outputs, attrs=()) -> bytes:
    out = b""
    for i in inputs:
        out += _ld(1, i.encode())
    for o in outputs:
        out += _ld(2, o.encode())
    out += _ld(4, op.encode())
    for a in attrs:
        out += _ld(5, a)
    return out


def _value_info(name: str) -> bytes:
    return _ld(1, name.encode())


def _model(nodes, initializers, inputs, outputs) -> bytes:
    g = b""
    for n in nodes:
        g += _ld(1, n)
    for t in initializers:
        g += _ld(5, t)
    for i in inputs:
        g += _ld(11, _value_info(i))
    for o in outputs:
        g += _ld(12, _value_info(o))
    return _ld(7, g)


# -- tests -------------------------------------------------------------------

rng = np.random.default_rng(8)


def _mlp_model(w1, b1, w2):
    nodes = [
        _node("Gemm", ["x", "w1", "b1"], ["h"], [_attr_i("transB", 1)]),
        _node("Relu", ["h"], ["a"]),
        _node("MatMul", ["a", "w2"], ["y"]),
    ]
    inits = [
        _tensor("w1", w1), _tensor("b1", b1), _tensor("w2", w2),
    ]
    return _model(nodes, inits, ["x", "w1", "b1", "w2"], ["y"])


def test_parse_roundtrip():
    w1 = rng.normal(0, 1, (8, 4)).astype(np.float32)  # Gemm transB
    b1 = rng.normal(0, 1, (8,)).astype(np.float32)
    w2 = rng.normal(0, 1, (8, 2)).astype(np.float32)
    g = of.parse_model(_mlp_model(w1, b1, w2))
    assert [n.op_type for n in g.nodes] == ["Gemm", "Relu", "MatMul"]
    assert g.inputs == ["x"]
    np.testing.assert_allclose(g.initializers["w1"].data, w1)
    np.testing.assert_allclose(g.initializers["b1"].data, b1)
    assert g.nodes[0].attrs["transB"] == 1


def test_compile_onnx_mlp_matches_numpy():
    w1 = rng.normal(0, 0.6, (8, 4)).astype(np.float32)
    b1 = rng.normal(0, 0.3, (8,)).astype(np.float32)
    w2 = rng.normal(0, 0.6, (8, 2)).astype(np.float32)
    data = _mlp_model(w1, b1, w2)
    x = rng.normal(0, 1, (16, 4))
    qm = of.compile_onnx_model(data, x, n_bits=8)
    got = qm.forward(x, FheMode.DISABLE)
    xq = qm.input_quantizer.dequant(qm.input_quantizer.quant(x))
    want = np.maximum(xq @ w1.T.astype(np.float64) + b1, 0) @ w2
    # quantized weights: allow a few percent
    span = np.abs(want).max() or 1.0
    assert np.max(np.abs(got - want)) <= 0.08 * span
    # EXECUTE runs the Gemms under the GLWE engine
    enc = qm.forward(x[:2], FheMode.EXECUTE)
    assert np.max(np.abs(enc - got[:2])) <= 0.15 * span


def test_structural_and_binary_ops_lower():
    w = rng.normal(0, 0.5, (4, 4)).astype(np.float32)
    nodes = [
        _node("MatMul", ["x", "w"], ["h"]),
        _node("Sigmoid", ["h"], ["s"]),
        _node("Add", ["s", "x"], ["r"]),
        _node("Clip", ["r"], ["c"], [_attr_f("min", -1.0), _attr_f("max", 1.0)]),
    ]
    data = _model(nodes, [_tensor("w", w)], ["x", "w"], ["c"])
    x = rng.normal(0, 1, (5, 4))
    qm = of.compile_onnx_model(data, x, n_bits=8)
    got = qm.forward(x, FheMode.DISABLE)
    assert got.shape == (5, 4)
    assert np.all(got <= 1.0 + 1e-9) and np.all(got >= -1.0 - 1e-9)


def test_reshape_transpose_pool():
    nodes = [
        _node("Transpose", ["x"], ["t"], [_attr_ints("perm", [0, 1, 3, 2])]),
        _node("MaxPool", ["t"], ["p"],
              [_attr_ints("kernel_shape", [2, 2]), _attr_ints("strides", [2, 2])]),
        _node("Reshape", ["p", "shape"], ["y"]),
    ]
    inits = [_tensor("shape", np.asarray([2, -1], dtype=np.int64))]
    data = _model(nodes, inits, ["x", "shape"], ["y"])
    g = of.parse_model(data)
    qm = of.graph_to_module(g)
    x = rng.normal(0, 1, (2, 3, 4, 4))
    qm.calibrate(x)
    out = qm.forward(x, FheMode.DISABLE)
    assert out.shape == (2, 12)


def test_unsupported_op_raises():
    data = _model([_node("LSTM", ["x"], ["y"])], [], ["x"], ["y"])
    with pytest.raises(NotImplementedError, match="LSTM"):
        of.graph_to_module(of.parse_model(data))
