"""Minimal ONNX frontend: protobuf wire-format parser + graph lowering.

The reference compiles ONNX models (reference:
ml/concrete-ml/src/concrete/ml/torch/compile.py:369 compile_onnx_model;
onnx/convert.py, onnx_utils.py:328 ONNX_OPS_TO_NUMPY_IMPL). This image
has no `onnx` package, so round 1 shipped a raising stub. This module
removes the dependency entirely: a from-scratch protobuf WIRE-FORMAT
reader for the ModelProto subset ONNX graphs need (field numbers from
the public onnx.proto3 schema), and a lowering of the common op set
onto ml/quantized_ops' DAG executor.

Supported ops (55): Gemm, MatMul, Conv, Add, Sub, Mul, Div, Sum, Pow,
PRelu, Relu, Sigmoid, Tanh, Softplus, Elu, Selu, Celu, LeakyRelu,
HardSigmoid, HardSwish, Clip, Sqrt, Reciprocal, Sin, Cos, Tan, Sinh,
Cosh, Asin, Acos, Atan, Asinh, Acosh, Atanh, Softmax, MaxPool,
AveragePool, GlobalAveragePool, Flatten, Reshape, Transpose, Squeeze,
Unsqueeze, Pad, Expand, Split, Slice, Gather, Identity, Cast,
BatchNormalization, Concat, ReduceSum, ReduceMean, ReduceMax, ReduceMin,
Resize, Greater(OrEqual), Less(OrEqual), Equal, And, Or, Xor, Where,
Neg, Abs, Exp, Log, Erf, Sign, Round, Floor, Not, plus
QuantizeLinear/DequantizeLinear (QAT import, compile_qat_onnx_model).
Weight/shape chains through constant nodes are folded host-side
(const_fold). torch.onnx.export-produced files parse directly.
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


_DT = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 11: np.float64, 12: np.uint32,
    13: np.uint64,
}


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
    if arr.dtype != np_dt and arr.size:
        # ONNX stores narrow ints in int32_data: honor the declared type
        arr = arr.astype(np_dt)
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
    "Sqrt": "Sqrt", "Reciprocal": "Reciprocal", "Sin": "Sin", "Cos": "Cos",
    "Tan": "Tan", "Sinh": "Sinh", "Cosh": "Cosh", "Asin": "Asin",
    "Acos": "Acos", "Atan": "Atan", "Asinh": "Asinh", "Acosh": "Acosh",
    "Atanh": "Atanh",
}
_BIN_OPS = {
    "Add": qo.QuantizedAdd, "Sub": qo.QuantizedSub, "Mul": qo.QuantizedMul,
    "Div": qo.QuantizedDiv, "Greater": qo.QuantizedGreater,
    "GreaterOrEqual": qo.QuantizedGreaterOrEqual,
    "Less": qo.QuantizedLess, "LessOrEqual": qo.QuantizedLessOrEqual,
    "Equal": qo.QuantizedEqual,
    "Min": qo.QuantizedMin, "Max": qo.QuantizedMax, "Or": qo.QuantizedOr,
    "And": qo.QuantizedAnd, "Xor": qo.QuantizedXor,
}


# -- constant folding ---------------------------------------------------------
#
# torch/brevitas exports route weights through DequantizeLinear(
# QuantizeLinear(w)) chains and shapes through Concat/Unsqueeze chains.
# Nodes whose inputs are ALL initializers are evaluated host-side and
# their outputs become initializers -- the importer trick every real
# frontend uses (the reference gets it from onnxoptimizer).


def _qdq_bounds(zp: np.ndarray) -> tuple[int, int]:
    """Quantized range from the zero-point tensor's dtype. ONNX QDQ
    zero-points are int8/uint8/int16/uint16; wider dtypes (some
    exporters store zp as int64) keep the signedness but mean 8-bit."""
    dt = zp.dtype if zp.dtype.kind in "iu" else np.dtype(np.int8)
    if dt.itemsize > 2:
        dt = np.dtype(np.int8 if dt.kind == "i" else np.uint8)
    info = np.iinfo(dt)
    return info.min, info.max


def _fold_eval(node: OnnxNode, ins: list[np.ndarray]):
    t = node.op_type
    a = ins[0] if ins else None
    if t == "Identity":
        return a
    if t == "Cast":
        return a  # quantized-pipeline values keep float-with-int semantics
    if t == "Reshape":
        shape = tuple(-1 if s == 0 else int(s) for s in ins[1])
        return np.asarray(a).reshape(shape)
    if t == "Transpose":
        return np.transpose(a, node.attrs.get("perm"))
    if t == "Squeeze":
        ax = node.attrs.get("axes") or (
            [int(v) for v in ins[1]] if len(ins) > 1 else None
        )
        return np.squeeze(a, axis=tuple(ax) if ax else None)
    if t == "Unsqueeze":
        ax = node.attrs.get("axes") or [int(v) for v in ins[1]]
        out = np.asarray(a)
        for x in sorted(int(v) for v in ax):
            out = np.expand_dims(out, axis=x)
        return out
    if t == "Concat":
        return np.concatenate(ins, axis=int(node.attrs.get("axis", 0)))
    if t == "Gather":
        return np.take(a, np.asarray(ins[1], np.int64),
                       axis=int(node.attrs.get("axis", 0)))
    if t == "Slice":
        starts, ends = ins[1], ins[2]
        axes = ins[3] if len(ins) > 3 else np.arange(len(starts))
        steps = ins[4] if len(ins) > 4 else np.ones(len(starts), np.int64)
        sl = [slice(None)] * np.asarray(a).ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            sl[int(ax)] = slice(int(st), None if en >= 2**62 else int(en),
                                int(sp))
        return np.asarray(a)[tuple(sl)]
    if t == "QuantizeLinear":
        scale = np.asarray(ins[1], np.float64)
        zp = ins[2] if len(ins) > 2 else np.zeros((), np.int8)
        qmin, qmax = _qdq_bounds(np.asarray(zp))
        ax = int(node.attrs.get("axis", 1))
        if scale.ndim == 1 and scale.size > 1:  # per-channel
            sh = [1] * np.asarray(a).ndim
            sh[ax] = -1
            scale = scale.reshape(sh)
            zp = np.asarray(zp, np.float64).reshape(sh)
        q = np.round(np.asarray(a, np.float64) / scale) + np.asarray(
            zp, np.float64
        )
        return np.clip(q, qmin, qmax)
    if t == "DequantizeLinear":
        scale = np.asarray(ins[1], np.float64)
        zp = ins[2] if len(ins) > 2 else np.zeros((), np.int8)
        ax = int(node.attrs.get("axis", 1))
        if scale.ndim == 1 and scale.size > 1:
            sh = [1] * np.asarray(a).ndim
            sh[ax] = -1
            scale = scale.reshape(sh)
            zp = np.asarray(zp, np.float64).reshape(sh)
        return (np.asarray(a, np.float64) - np.asarray(zp, np.float64)) * scale
    if t == "Add":
        return np.asarray(a, np.float64) + np.asarray(ins[1], np.float64)
    if t == "Sub":
        return np.asarray(a, np.float64) - np.asarray(ins[1], np.float64)
    if t == "Mul":
        return np.asarray(a, np.float64) * np.asarray(ins[1], np.float64)
    if t == "Div":
        return np.asarray(a, np.float64) / np.asarray(ins[1], np.float64)
    if t == "Neg":
        return -np.asarray(a, np.float64)
    if t == "Sqrt":
        return np.sqrt(np.asarray(a, np.float64))
    if t == "Clip":
        lo = float(ins[1]) if len(ins) > 1 else -3.4e38
        hi = float(ins[2]) if len(ins) > 2 else 3.4e38
        return np.clip(np.asarray(a, np.float64), lo, hi)
    if t == "ConstantOfShape":
        fill = node.attrs.get("value")
        v = float(np.asarray(fill.data).reshape(-1)[0]) if fill is not None else 0.0
        return np.full([int(s) for s in np.asarray(a).reshape(-1)], v)
    if t == "Equal":
        return np.asarray(a) == np.asarray(ins[1])
    if t == "Where":
        return np.where(np.asarray(a, bool), ins[1], ins[2])
    if t == "Expand":
        return np.broadcast_to(
            a, np.broadcast_shapes(
                np.shape(a), tuple(int(s) for s in np.asarray(ins[1]).reshape(-1))
            )
        ).copy()
    if t == "Range":
        return np.arange(float(ins[0]), float(ins[1]), float(ins[2]))
    return None  # not foldable


def const_fold(g: OnnxGraph) -> OnnxGraph:
    """Evaluate nodes whose inputs are all initializers; their outputs
    join g.initializers and the nodes are dropped. `Constant` NODES
    (the torchscript exporter emits them instead of initializers)
    become initializers first."""
    inits = dict(g.initializers)
    kept = []
    for node in g.nodes:
        if node.op_type == "Constant" and not node.inputs:
            v = None
            for key, av in node.attrs.items():
                if key == "value" and isinstance(av, OnnxTensor):
                    v = np.asarray(av.data)
                elif key in ("value_float", "value_int"):
                    v = np.asarray(av)
                elif key in ("value_floats", "value_ints"):
                    v = np.asarray(list(av))
            if v is None:
                raise NotImplementedError(
                    f"Constant node without supported value attr: {node.attrs}"
                )
            inits[node.outputs[0]] = OnnxTensor(
                name=node.outputs[0], dims=np.shape(v), data=v
            )
            continue
        if node.inputs and all(i in inits for i in node.inputs if i):
            ins = [np.asarray(inits[i].data) for i in node.inputs if i]
            val = _fold_eval(node, ins)
            if val is not None:
                for oname in node.outputs:
                    inits[oname] = OnnxTensor(
                        name=oname, dims=np.shape(val), data=np.asarray(val)
                    )
                continue
        kept.append(node)
    return OnnxGraph(nodes=kept, initializers=inits, inputs=g.inputs,
                     outputs=g.outputs)


@dataclasses.dataclass
class _Const:
    """A constant tensor node in the DAG."""

    value: np.ndarray

    def calibrate(self, *a):
        return self.value

    def forward(self, *a, fhe=None):
        return self.value


def graph_to_module(g: OnnxGraph, n_bits=8) -> qo.QuantizedGraphModule:
    """Lower the parsed graph onto QuantizedGraphModule. Single graph
    input; initializers become op weights or constant nodes. n_bits:
    int or the reference's four-key dict (op_inputs/op_weights/
    model_inputs/model_outputs, post_training.py get_n_bits_dict).

    QuantizeLinear/DequantizeLinear pairs on ACTIVATIONS lower to
    fixed-scale fake-quant ops (QAT import: scales come from the trained
    model, reference torch/compile.py:452 compile_brevitas_qat_model /
    quantization/qat_quantizers.py); on WEIGHTS they constant-fold so
    linear ops consume the exact dequantized integer grid."""
    from tfhe_tpu.ml.quantization import get_n_bits_dict

    n_bits_cfg = get_n_bits_dict(n_bits)
    n_bits, n_bits_w = n_bits_cfg["op_inputs"], n_bits_cfg["op_weights"]
    g = const_fold(g)
    assert g.inputs, "graph has no inputs"
    # input i binds to id "input" (i=0, compat) / "input:i" (i>0) --
    # multi-input graphs (reference pytest MultiInputNN family) forward
    # with a tuple of arrays
    name_to_id: dict[str, object] = {
        nm: ("input" if i == 0 else f"input:{i}")
        for i, nm in enumerate(g.inputs)
    }
    nodes: list[qo.GraphNode] = []
    qdq_ids: set = set()  # node ids produced by QuantizeLinear
    input_qdq: dict = {}  # input id -> fixed trained quantizer, if QAT

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
                QuantizedGemm(weights=w, bias=b, n_bits=n_bits,
                              n_bits_w=n_bits_w),
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
                    n_bits_w=n_bits_w,
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
            # opset >= 13: axes arrive as a (constant) second input;
            # MISSING axes means reduce over ALL axes (ONNX spec) --
            # and multi-axis lists reduce jointly, not axes[0] only
            axis = node.attrs.get("axes")
            if axis is None and len(node.inputs) > 1 and node.inputs[1]:
                axis = [
                    int(v)
                    for v in np.asarray(
                        g.initializers[node.inputs[1]].data
                    ).reshape(-1)
                ]
            if axis is not None:
                axis = tuple(int(a) for a in axis) if len(axis) != 1 \
                    else int(axis[0])
            out = add(
                qo.QuantizedReduceSum(
                    axis=axis,
                    keepdims=bool(node.attrs.get("keepdims", 1)),
                ),
                (resolve(node.inputs[0]),),
            )
        elif op_t in ("Cast",):
            out = add(qo.QuantizedCast(), (resolve(node.inputs[0]),))
        elif op_t == "Softmax":
            out = add(
                qo.QuantizedSoftmax(axis=int(node.attrs.get("axis", -1))),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "Gather":
            if node.inputs[1] in g.initializers:
                idx = np.asarray(g.initializers[node.inputs[1]].data, np.int64)
                out = add(
                    qo.QuantizedGather(
                        indices=idx, axis=int(node.attrs.get("axis", 0))
                    ),
                    (resolve(node.inputs[0]),),
                )
            elif node.inputs[0] in g.initializers:
                # embedding form: CONSTANT table, CLEAR graph-input
                # indices (reference EmbeddingModel: the lookup runs in
                # the clear quantized graph; only downstream math is
                # encrypted). Encrypted-INDEX gather stays unsupported.
                table = np.asarray(
                    g.initializers[node.inputs[0]].data, np.float64
                )
                out = add(
                    qo.QuantizedEmbedding(
                        table=table, axis=int(node.attrs.get("axis", 0))
                    ),
                    (resolve(node.inputs[1]),),
                )
            else:
                raise NotImplementedError(
                    "Gather with encrypted (non-constant) indices cannot "
                    "be evaluated under FHE"
                )
        elif op_t == "Slice":
            def _c(i, default=None):
                if len(node.inputs) > i and node.inputs[i]:
                    return tuple(
                        int(v) for v in g.initializers[node.inputs[i]].data
                    )
                return default
            starts = _c(1) or tuple(node.attrs.get("starts", ()))
            ends = _c(2) or tuple(node.attrs.get("ends", ()))
            axes = _c(3) or (tuple(node.attrs["axes"])
                             if "axes" in node.attrs else None)
            steps = _c(4)
            out = add(
                qo.QuantizedSlice(starts=starts, ends=ends, axes=axes,
                                  steps=steps),
                (resolve(node.inputs[0]),),
            )
        elif op_t in ("ReduceMean", "ReduceMax", "ReduceMin"):
            axes = node.attrs.get("axes")
            if axes is None and len(node.inputs) > 1:
                axes = [int(v) for v in g.initializers[node.inputs[1]].data]
            out = add(
                qo.QuantizedReduce(
                    kind=op_t[6:].lower(),
                    axes=tuple(axes) if axes else (-1,),
                    keepdims=bool(node.attrs.get("keepdims", 1)),
                ),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "GlobalAveragePool":
            out = add(qo.QuantizedGlobalAveragePool(),
                      (resolve(node.inputs[0]),))
        elif op_t == "Resize":
            scales = None
            for i in (2, 1):  # scales input (opset 11+: input 2)
                if len(node.inputs) > i and node.inputs[i] in g.initializers:
                    v = np.asarray(
                        g.initializers[node.inputs[i]].data, np.float64
                    )
                    if v.size == 4:
                        scales = (float(v[2]), float(v[3]))
                        break
            if scales is None:
                raise NotImplementedError("Resize without constant scales")
            out = add(qo.QuantizedResize(scales=scales),
                      (resolve(node.inputs[0]),))
        elif op_t == "Squeeze":
            axes = node.attrs.get("axes")
            if axes is None and len(node.inputs) > 1:
                axes = [int(v) for v in g.initializers[node.inputs[1]].data]
            out = add(qo.QuantizedSqueeze(axis=tuple(axes)[0]),
                      (resolve(node.inputs[0]),))
        elif op_t == "Unsqueeze":
            axes = node.attrs.get("axes")
            if axes is None and len(node.inputs) > 1:
                axes = [int(v) for v in g.initializers[node.inputs[1]].data]
            out = add(qo.QuantizedUnsqueeze(axis=tuple(axes)[0]),
                      (resolve(node.inputs[0]),))
        elif op_t == "Pad":
            pads = node.attrs.get("pads")
            if pads is None and len(node.inputs) > 1:
                pads = [int(v) for v in g.initializers[node.inputs[1]].data]
            nd = len(pads) // 2
            pad_width = tuple(
                (int(pads[i]), int(pads[i + nd])) for i in range(nd)
            )
            val = 0.0
            if len(node.inputs) > 2 and node.inputs[2] in g.initializers:
                val = float(g.initializers[node.inputs[2]].data)
            out = add(qo.QuantizedPad(pads=pad_width, value=val),
                      (resolve(node.inputs[0]),))
        elif op_t == "Expand":
            shape = tuple(
                int(v) for v in g.initializers[node.inputs[1]].data
            )
            out = add(qo.QuantizedExpand(shape=shape),
                      (resolve(node.inputs[0]),))
        elif op_t == "Split":
            # one Slice per output (the DAG is single-output per node)
            axis = int(node.attrs.get("axis", 0))
            sizes = node.attrs.get("split")
            if sizes is None and len(node.inputs) > 1:
                sizes = [int(v) for v in g.initializers[node.inputs[1]].data]
            assert sizes, "Split requires explicit sizes"
            src = resolve(node.inputs[0])
            off = 0
            for oname, sz in zip(node.outputs, sizes):
                nid = add(
                    qo.QuantizedSlice(starts=(off,), ends=(off + int(sz),),
                                      axes=(axis,)),
                    (src,),
                )
                name_to_id[oname] = nid
                off += int(sz)
            continue
        elif op_t == "Sum":
            out = add(qo.QuantizedSum(n_inputs=len(node.inputs)),
                      tuple(resolve(i) for i in node.inputs))
        elif op_t == "PRelu":
            if node.inputs[1] in g.initializers:
                slope = np.asarray(
                    g.initializers[node.inputs[1]].data, np.float64
                )
                if slope.size == 1:
                    out = add(
                        qo.make_univariate("PRelu", n_bits=n_bits,
                                        slope=float(slope.ravel()[0])),
                        (resolve(node.inputs[0]),),
                    )
                else:
                    out = add(
                        qo.QuantizedPRelu(),
                        (resolve(node.inputs[0]),
                         resolve(node.inputs[1])),
                    )
            else:
                out = add(
                    qo.QuantizedPRelu(),
                    (resolve(node.inputs[0]), resolve(node.inputs[1])),
                )
        elif op_t == "Pow":
            if node.inputs[1] not in g.initializers:
                raise NotImplementedError("Pow with non-constant exponent")
            p = float(np.asarray(g.initializers[node.inputs[1]].data).ravel()[0])
            out = add(
                qo.make_univariate("Pow", n_bits=n_bits, exponent=p),
                (resolve(node.inputs[0]),),
            )
        elif op_t == "QuantizeLinear":
            scale = float(
                np.asarray(g.initializers[node.inputs[1]].data).ravel()[0]
            )
            zp_t = (
                g.initializers[node.inputs[2]].data
                if len(node.inputs) > 2 and node.inputs[2] in g.initializers
                else np.zeros((), np.int8)
            )
            qmin, qmax = _qdq_bounds(np.asarray(zp_t))
            zp = float(np.asarray(zp_t, np.float64).ravel()[0])
            src = resolve(node.inputs[0])
            out = add(
                qo.QuantizedQDQ(scale=scale, zero_point=zp, qmin=qmin,
                                qmax=qmax),
                (src,),
            )
            qdq_ids.add(out)
            if isinstance(src, str) and src.startswith("input"):
                # trained quantizer on ANY graph input (multi-input QAT
                # graphs carry one Q/DQ pair per input)
                input_qdq[src] = nodes[out].op
        elif op_t == "DequantizeLinear":
            src = resolve(node.inputs[0])
            if src in qdq_ids:
                # Q->DQ pair: the QDQ node already returns dequantized
                # values; DQ is the identity half of the pair
                for oname in node.outputs:
                    name_to_id[oname] = src
                continue
            scale = float(
                np.asarray(g.initializers[node.inputs[1]].data).ravel()[0]
            )
            zp = 0.0
            if len(node.inputs) > 2 and node.inputs[2] in g.initializers:
                zp = float(
                    np.asarray(
                        g.initializers[node.inputs[2]].data, np.float64
                    ).ravel()[0]
                )
            out = add(qo.QuantizedDequant(scale=scale, zero_point=zp), (src,))
        else:
            raise NotImplementedError(f"ONNX op {op_t} not supported")
        for oname in node.outputs:
            name_to_id[oname] = out
    qm = qo.QuantizedGraphModule(nodes, n_bits=n_bits_cfg)
    if input_qdq:
        from tfhe_tpu.ml.quantization import UniformQuantizer

        presets = {}
        for src, op in input_qdq.items():
            idx = 0 if src == "input" else int(src.split(":")[1])
            q = UniformQuantizer(
                n_bits=(op.qmax - op.qmin + 1).bit_length() - 1,
                is_signed=op.qmin < 0,
            )
            q.scale = np.float64(op.scale)
            q.zero_point = np.float64(op.zero_point)
            presets[idx] = q
        qm.preset_input_quantizers = presets
        qm.preset_input_quantizer = presets.get(0)
    return qm


def compile_qat_onnx_model(model, x_cal, n_bits: int = 8, seed: int = 0):
    """QAT graph import (reference torch/compile.py:452
    compile_brevitas_qat_model): the model is a QDQ/QCDQ ONNX export
    (brevitas `export_onnx_qcdq`, torch.ao quantized export) whose
    QuantizeLinear/DequantizeLinear nodes carry the TRAINED scales and
    zero-points. Lowering takes every quantizer from the graph --
    calibration only walks ranges for TLU tables; the input quantizer
    and all activation grids are the model's own.

    Raises if the graph carries no QDQ pairs (then it is not a QAT
    export -- use compile_onnx_model)."""
    data = open(model, "rb").read() if isinstance(model, str) else model
    g = parse_model(data)
    if not any(
        n.op_type in ("QuantizeLinear", "DequantizeLinear") for n in g.nodes
    ):
        raise ValueError(
            "no QuantizeLinear/DequantizeLinear nodes: not a QAT export "
            "(use compile_onnx_model for float graphs)"
        )
    qm = graph_to_module(g, n_bits=n_bits)
    qm.calibrate(np.asarray(x_cal, np.float64))
    qm.compile(seed=seed)
    return qm


def compile_onnx_model(model, x_cal, n_bits: int = 8, seed: int = 0,
                       keygen: bool = True, params=None):
    """The reference compile_onnx_model entry (compile.py:369): parse,
    lower, calibrate, keygen. `model` is a path or ModelProto bytes.
    keygen=False skips FHE key generation (DISABLE/SIMULATE-only use;
    call .compile() before fhe='execute'). `params` overrides the GLWE
    matmul parameter set for the linear nodes."""
    if isinstance(model, (str, bytes)):
        data = open(model, "rb").read() if isinstance(model, str) else model
    else:
        raise TypeError("model must be a path or serialized ModelProto bytes")
    g = parse_model(data)
    qm = graph_to_module(g, n_bits=n_bits)
    qm.calibrate(_cal_inputs(x_cal))
    if keygen:
        qm.compile(seed=seed, params=params)
    return qm


def _cal_inputs(x_cal):
    """Calibration data: one array, or a TUPLE of arrays for multi-input
    graphs. A plain list is single-input DATA (np.asarray coerces it) --
    only tuples mark multi-input bundles, matching
    QuantizedGraphModule._as_inputs."""
    if isinstance(x_cal, tuple):
        return tuple(np.asarray(v, np.float64) for v in x_cal)
    return np.asarray(x_cal, np.float64)
