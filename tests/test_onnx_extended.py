"""Extended ONNX op-set + QAT (QDQ) import tests.

Covers the round-3 frontend depth work: Softmax/Gather/Slice/
ReduceMean/GlobalAveragePool/Split/Pad/Squeeze/Unsqueeze/Resize/Pow/
PRelu/Sum lowering, host-side constant folding of weight chains, and
the QAT import path where QuantizeLinear/DequantizeLinear scales come
from the model rather than calibration (reference
torch/compile.py:452, quantization/qat_quantizers.py).

Fixtures reuse test_onnx_frontend's hand-rolled protobuf encoder.
"""

import numpy as np
import pytest

from tfhe_tpu.ml import onnx_frontend as of
from tfhe_tpu.ml.common import FheMode
from tests.test_onnx_frontend import (
    _attr_f,
    _attr_i,
    _attr_ints,
    _model,
    _node,
    _tensor,
)

rng = np.random.default_rng(31)


def _run(data, x, n_bits=8):
    g = of.parse_model(data)
    qm = of.graph_to_module(g, n_bits=n_bits)
    qm.calibrate(x)
    return qm, qm.forward(x, FheMode.DISABLE)


def test_softmax_reducemean():
    nodes = [
        _node("Softmax", ["x"], ["s"], [_attr_i("axis", 1)]),
        _node("ReduceMean", ["s"], ["y"],
              [_attr_ints("axes", [1]), _attr_i("keepdims", 0)]),
    ]
    data = _model(nodes, [], ["x"], ["y"])
    x = rng.normal(0, 2, (5, 7))
    _, got = _run(data, x)
    e = np.exp(x - x.max(axis=1, keepdims=True))
    want = (e / e.sum(axis=1, keepdims=True)).mean(axis=1)
    # softmax then mean over axis: input quantization adds small error
    np.testing.assert_allclose(got, want, atol=0.02)


def test_gather_slice_split():
    idx = np.asarray([3, 0, 2], dtype=np.int64)
    nodes = [
        _node("Gather", ["x", "idx"], ["g"], [_attr_i("axis", 1)]),
        _node("Slice", ["g", "st", "en", "ax"], ["s"]),
        _node("Split", ["s"], ["a", "b"], [_attr_i("axis", 1),
                                           _attr_ints("split", [1, 1])]),
        _node("Add", ["a", "b"], ["y"]),
    ]
    inits = [
        _tensor("idx", idx),
        _tensor("st", np.asarray([0], np.int64)),
        _tensor("en", np.asarray([2], np.int64)),
        _tensor("ax", np.asarray([1], np.int64)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    x = rng.normal(0, 1, (4, 6))
    _, got = _run(data, x)
    g = x[:, idx][:, 0:2]
    want = g[:, 0:1] + g[:, 1:2]
    np.testing.assert_allclose(got, want, atol=0.05)


def test_pad_squeeze_unsqueeze_expand():
    nodes = [
        _node("Unsqueeze", ["x", "uax"], ["u"]),
        _node("Pad", ["u", "pads"], ["p"]),
        _node("Squeeze", ["p", "sax"], ["q"]),
        _node("Expand", ["q", "eshape"], ["y"]),
    ]
    inits = [
        _tensor("uax", np.asarray([0], np.int64)),
        _tensor("pads", np.asarray([0, 1, 0, 0, 0, 1], np.int64)),
        _tensor("sax", np.asarray([0], np.int64)),
        _tensor("eshape", np.asarray([2, 4, 5], np.int64)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    x = rng.normal(0, 1, (3, 4))
    _, got = _run(data, x)
    assert got.shape == (2, 4, 5)  # padded (4,5) broadcast to (2,4,5)


def test_global_avgpool_resize():
    nodes = [
        _node("Resize", ["x", "roi", "scales"], ["r"]),
        _node("GlobalAveragePool", ["r"], ["y"]),
    ]
    inits = [
        _tensor("roi", np.zeros(0, np.float32)),
        _tensor("scales", np.asarray([1, 1, 2, 2], np.float32)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    x = rng.normal(0, 1, (2, 3, 4, 4))
    _, got = _run(data, x)
    assert got.shape == (2, 3, 1, 1)
    want = x.mean(axis=(2, 3), keepdims=True)  # NN-upsample keeps means
    np.testing.assert_allclose(got, want, atol=0.05)


def test_pow_prelu_sum():
    nodes = [
        _node("Pow", ["x", "p"], ["p2"]),
        _node("PRelu", ["x", "slope"], ["pr"]),
        _node("Sum", ["p2", "pr", "x"], ["y"]),
    ]
    inits = [
        _tensor("p", np.asarray([2.0], np.float32)),
        _tensor("slope", np.asarray([0.1], np.float32)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    x = rng.normal(0, 1, (6, 3))
    _, got = _run(data, x)
    want = x**2 + np.where(x > 0, x, 0.1 * x) + x
    span = np.abs(want).max()
    assert np.max(np.abs(got - want)) < 0.08 * span


def test_const_fold_weight_chain():
    """Weights routed through Transpose+DQ(Q(w)) fold to initializers."""
    w = rng.normal(0, 0.5, (3, 4)).astype(np.float32)  # stored transposed
    nodes = [
        _node("QuantizeLinear", ["w", "ws", "wz"], ["wq"]),
        _node("DequantizeLinear", ["wq", "ws", "wz"], ["wd"]),
        _node("Transpose", ["wd"], ["wt"], [_attr_ints("perm", [1, 0])]),
        _node("MatMul", ["x", "wt"], ["y"]),
    ]
    inits = [
        _tensor("w", w),
        _tensor("ws", np.asarray([0.01], np.float32)),
        _tensor("wz", np.asarray([0], np.int64)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    g = of.const_fold(of.parse_model(data))
    assert [n.op_type for n in g.nodes] == ["MatMul"]
    assert g.initializers["wt"].data.shape == (4, 3)
    x = rng.normal(0, 1, (5, 4))
    qm = of.graph_to_module(of.parse_model(data))
    qm.calibrate(x)
    got = qm.forward(x, FheMode.DISABLE)
    want = x @ (np.round(w / 0.01).clip(-2**63, 2**63) * 0.01).T
    span = np.abs(want).max()
    assert np.max(np.abs(got - want)) < 0.05 * span


def test_qat_input_quantizer_from_model():
    """QAT import: the input quantizer is the MODEL's scale/zero-point,
    not a calibration fit."""
    w = rng.normal(0, 0.4, (4, 2)).astype(np.float32)
    nodes = [
        _node("QuantizeLinear", ["x", "xs", "xz"], ["xq"]),
        _node("DequantizeLinear", ["xq", "xs", "xz"], ["xd"]),
        _node("MatMul", ["xd", "w"], ["h"]),
        _node("Relu", ["h"], ["y"]),
    ]
    inits = [
        _tensor("w", w),
        _tensor("xs", np.asarray([0.125], np.float32)),
        _tensor("xz", np.asarray([0], np.int64)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    x = rng.normal(0, 1, (8, 4))
    qm = of.compile_qat_onnx_model(data, x, n_bits=8)
    assert float(qm.input_quantizer.scale) == 0.125  # model's, not fitted
    got = qm.forward(x, FheMode.DISABLE)
    xq = np.clip(np.round(x / 0.125), -128, 127) * 0.125
    want = np.maximum(xq @ w, 0)
    span = np.abs(want).max()
    assert np.max(np.abs(got - want)) < 0.05 * span


def test_qat_rejects_float_graph():
    w = rng.normal(0, 0.4, (4, 2)).astype(np.float32)
    data = _model([_node("MatMul", ["x", "w"], ["y"])], [_tensor("w", w)],
                  ["x"], ["y"])
    with pytest.raises(ValueError, match="not a QAT export"):
        of.compile_qat_onnx_model(data, rng.normal(0, 1, (4, 4)))


def test_compile_brevitas_qat_model_routes_bytes():
    from tfhe_tpu.ml.quantized_module import compile_brevitas_qat_model

    w = rng.normal(0, 0.4, (4, 2)).astype(np.float32)
    nodes = [
        _node("QuantizeLinear", ["x", "xs", "xz"], ["xq"]),
        _node("DequantizeLinear", ["xq", "xs", "xz"], ["xd"]),
        _node("MatMul", ["xd", "w"], ["y"]),
    ]
    inits = [
        _tensor("w", w),
        _tensor("xs", np.asarray([0.0625], np.float32)),
        _tensor("xz", np.asarray([0], np.int64)),
    ]
    data = _model(nodes, inits, ["x"], ["y"])
    qm = compile_brevitas_qat_model(data, rng.normal(0, 1, (8, 4)))
    assert float(qm.input_quantizer.scale) == 0.0625


def test_trig_tlus_lower():
    nodes = [
        _node("Sin", ["x"], ["a"]),
        _node("Sqrt", ["a"], ["b"]),
        _node("Atan", ["b"], ["y"]),
    ]
    data = _model(nodes, [], ["x"], ["y"])
    x = rng.uniform(0.1, 1.4, (5, 5))
    _, got = _run(data, x)
    want = np.arctan(np.sqrt(np.sin(x)))
    np.testing.assert_allclose(got, want, atol=0.03)
