"""QAT CNN under full FHE: zero client-side nonlinearities, accuracy
pinned vs the float model (VERDICT round-2 item 7 'done' criterion;
reference compile_brevitas_qat_model torch/compile.py:452 + EXECUTE
semantics of quantization/quantized_module.py).

The fixture is a QCDQ ONNX export (QuantizeLinear/DequantizeLinear
carrying trained scales) of a small conv->relu->gemm->relu net encoded
with the hand-rolled protobuf writer. onnx_qat_to_fhe lowers it to an
FheSequential: conv as im2col into the LWE linear path, every
activation+requantization one PBS TLU.
"""

import numpy as np
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.ml.qat_fhe import onnx_qat_to_fhe, run_qat_fhe
from tests.test_onnx_frontend import (
    _attr_i,
    _ld,
    _model,
    _node,
    _tag,
    _tensor,
    _varint,
)

P = tp.TOY_SHORTINT  # 16-value plaintext space

rng = np.random.default_rng(17)


def _tensor_u8(name: str, arr: np.ndarray) -> bytes:
    """uint8 TensorProto via raw_data (QDQ zero-points are uint8)."""
    arr = np.asarray(arr, np.uint8)
    out = b""
    for d in arr.shape:
        out += _tag(1, 0) + _varint(d)
    out += _tag(2, 0) + _varint(2)  # dtype 2 = uint8
    out += _ld(8, name.encode())
    out += _ld(9, arr.tobytes())
    return out


def _qat_cnn(conv_w, head_w):
    """x(1,1,3,3) -> Q/DQ -> Conv(2x2) -> Relu -> Q/DQ(s=2) -> Flatten
    -> MatMul -> Relu -> Q/DQ -> output. All quantizers trained-scale
    initializers; weights ride Q/DQ pairs (the QCDQ shape)."""
    nodes = [
        _node("QuantizeLinear", ["x", "s1", "z_u8"], ["xq"]),
        _node("DequantizeLinear", ["xq", "s1", "z_u8"], ["xd"]),
        _node("QuantizeLinear", ["cw", "s1", "z_i8"], ["cwq"]),
        _node("DequantizeLinear", ["cwq", "s1", "z_i8"], ["cwd"]),
        _node("Conv", ["xd", "cwd"], ["c"],
              [_attr_i("group", 1)]),
        _node("Relu", ["c"], ["cr"]),
        _node("QuantizeLinear", ["cr", "s2", "z_u8"], ["aq"]),
        _node("DequantizeLinear", ["aq", "s2", "z_u8"], ["ad"]),
        _node("Flatten", ["ad"], ["f"], [_attr_i("axis", 1)]),
        _node("QuantizeLinear", ["hw", "s1", "z_i8"], ["hwq"]),
        _node("DequantizeLinear", ["hwq", "s1", "z_i8"], ["hwd"]),
        _node("MatMul", ["f", "hwd"], ["h"]),
        _node("Relu", ["h"], ["hr"]),
        _node("QuantizeLinear", ["hr", "s1", "z_u8"], ["yq"]),
        _node("DequantizeLinear", ["yq", "s1", "z_u8"], ["y"]),
    ]
    inits = [
        _tensor("cw", conv_w.astype(np.float32)),
        _tensor("hw", head_w.astype(np.float32)),
        _tensor("s1", np.asarray([1.0], np.float32)),
        _tensor("s2", np.asarray([2.0], np.float32)),
        _tensor_u8("z_u8", np.asarray(0)),
        _tensor("z_i8", np.asarray([0], np.int64)),  # int8-range zp
    ]
    return _model(nodes, inits, ["x"], ["y"])


def _float_forward(x_img, conv_w, head_w):
    """The float model, with the trained activation grids applied (the
    QAT semantics: fake-quant at every boundary)."""
    b, _, h, w = x_img.shape
    co = conv_w.shape[0]
    acc = np.zeros((b, co, h - 1, w - 1))
    for y in range(h - 1):
        for xx in range(w - 1):
            patch = x_img[:, :, y : y + 2, xx : xx + 2].reshape(b, -1)
            acc[:, :, y, xx] = patch @ conv_w.reshape(co, -1).T
    a = np.clip(np.round(np.maximum(acc, 0) / 2.0), 0, 15) * 2.0
    hv = a.reshape(b, -1) @ head_w
    return np.clip(np.round(np.maximum(hv, 0)), 0, 15)


def test_qat_cnn_full_fhe_accuracy_pinned():
    conv_w = rng.integers(-1, 2, size=(2, 1, 2, 2)).astype(np.float64)
    # head: 2 nonzero ternary weights per output keeps the accumulator
    # inside the 16-value space (inputs are <= 2 after the s=2 grid)
    head_w = np.zeros((8, 2))
    head_w[1, 0], head_w[5, 0] = 1, -1
    head_w[2, 1], head_w[6, 1] = 1, 1
    data = _qat_cnn(conv_w, head_w)

    x = rng.integers(0, 2, size=(3, 1, 3, 3)).astype(np.float64)
    got, want = run_qat_fhe(data, P, x, in_hw=(3, 3), seed=11)

    # FHE == the clear integer pipeline, bit-exact
    np.testing.assert_array_equal(got, want)
    # accuracy pinned vs the float model: output grid s=1, zp=0
    y_f = _float_forward(x, conv_w, head_w)
    assert np.max(np.abs(got.astype(np.float64) - y_f)) <= 1.0, (got, y_f)


def test_qat_to_fhe_structure():
    conv_w = np.zeros((2, 1, 2, 2))
    conv_w[0, 0, 0, 0], conv_w[1, 0, 1, 1] = 1, -1
    head_w = np.zeros((8, 2))
    head_w[0, 0], head_w[4, 1] = 1, 1
    net, io = onnx_qat_to_fhe(_qat_cnn(conv_w, head_w), P, in_hw=(3, 3))
    from tfhe_tpu.ml.fhe_pipeline import FheConv2d, FheLinear, FheTlu

    kinds = [type(l).__name__ for l in net.layers]
    assert kinds == ["FheConv2d", "FheTlu", "FheLinear", "FheTlu"]
    assert net.layers[0].out_hw == (2, 2)
    assert io["space"] == 16


def test_qat_rejects_float_weights():
    nodes = [
        _node("QuantizeLinear", ["x", "s1", "z"], ["xq"]),
        _node("DequantizeLinear", ["xq", "s1", "z"], ["xd"]),
        _node("MatMul", ["xd", "w"], ["h"]),
        _node("QuantizeLinear", ["h", "s1", "z"], ["y"]),
    ]
    inits = [
        _tensor("w", np.ones((2, 2), np.float32)),
        _tensor("s1", np.asarray([1.0], np.float32)),
        _tensor_u8("z", np.asarray(0)),
    ]
    with pytest.raises(ValueError, match="raw float initializer"):
        onnx_qat_to_fhe(_model(nodes, inits, ["x"], ["y"]), P)


def test_fhe_conv2d_matches_dense_lowering():
    """FheConv2d (im2col gather) must agree with conv2d_as_linear (dense
    matrix) on the clear integer path AND under FHE."""
    from tfhe_tpu.ml.fhe_pipeline import (
        FheConv2d,
        FheSequential,
        FheTlu,
        conv2d_as_linear,
    )

    w = rng.integers(-1, 2, size=(2, 1, 2, 2))
    x = rng.integers(0, 2, size=(2, 9))  # 3x3 images, batch 2

    relu_q = lambda v: max(0, min(int(v), 3))
    net_a = FheSequential(
        [FheConv2d(w, in_hw=(3, 3)), FheTlu(relu_q)], P, seed=4
    )
    net_b = FheSequential(
        [conv2d_as_linear(w, in_hw=(3, 3)), FheTlu(relu_q)], P, seed=4
    )
    net_a.compile(input_hi=1)
    net_b.compile(input_hi=1)
    assert (net_a.clear_forward(x) == net_b.clear_forward(x)).all()
    got_a = net_a.decrypt(net_a.run(net_a.encrypt(x)))
    got_b = net_b.decrypt(net_b.run(net_b.encrypt(x)))
    np.testing.assert_array_equal(got_a, got_b)
    np.testing.assert_array_equal(got_a, net_a.clear_forward(x))
