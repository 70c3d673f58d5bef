"""Quantized op zoo + DAG graph executor (reference quantized_ops.py's
54 classes; quantized_module.py graph evaluation)."""

import numpy as np
import pytest

from tfhe_tpu.ml import quantized_ops as qo
from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.quantized_module import QuantizedGemm, QuantizedTLU


rng = np.random.default_rng(2)


@pytest.mark.parametrize("name", sorted(qo.UNIVARIATE_OPS))
def test_univariate_table_matches_fn(name):
    import zlib

    op = qo.make_univariate(name, n_bits=8)
    # per-op rng with a STABLE hash (hash() is PYTHONHASHSEED-randomized
    # per process and made this test flaky at discontinuities);
    # singular ops (Not, Reciprocal) keep inputs off the pole at 0
    op_rng = np.random.default_rng(zlib.crc32(name.encode()) % 2**31)
    x = op_rng.normal(0, 2, (4, 8))
    if name in ("Not", "Reciprocal"):
        x = np.where(np.abs(x) < 0.5, 1.0 + np.abs(x), x)
    ref = qo.UNIVARIATE_OPS[name](x)
    got = op.forward(x, FheMode.DISABLE)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
    # quantized (simulate) path: the table is EXACTLY the fn evaluated
    # on the calibrated grid -- compare on that grid, which is immune to
    # inputs straddling a discontinuity (Floor/Sign/steps)
    op.calibrate(x)
    got_q = op.forward(x, FheMode.SIMULATE)
    ref_q = qo.UNIVARIATE_OPS[name](op._q.dequant(op._q.quant(x)))
    np.testing.assert_allclose(got_q, ref_q, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name,kw", [
    ("PRelu", {"slope": 0.5}),
    ("Clip", {"min": -2.0, "max": 2.0}),
    ("Pow", {"exponent": 2.0}),
    ("Pow", {"exponent": 0.5}),
])
def test_parametrized_univariate(name, kw):
    op = qo.make_univariate(name, **kw)
    x = rng.normal(0, 1.5, (3, 5))
    got = op.forward(x, FheMode.DISABLE)
    if name == "PRelu":
        np.testing.assert_allclose(got, np.where(x > 0, x, 0.5 * x))
    elif name == "Clip":
        np.testing.assert_allclose(got, np.clip(x, -2, 2))


def test_structural_ops():
    x = rng.normal(0, 1, (2, 3, 4, 4))
    assert qo.QuantizedReshape((2, 48)).forward(x, 0).shape == (2, 48)
    assert qo.QuantizedTranspose((0, 2, 3, 1)).forward(x, 0).shape == (2, 4, 4, 3)
    assert qo.QuantizedUnsqueeze(0).forward(x, 0).shape == (1, 2, 3, 4, 4)
    assert qo.QuantizedSqueeze(0).forward(x[None][0:1], 0).shape == (2, 3, 4, 4)
    assert qo.QuantizedPad(((0, 0), (0, 0), (1, 1), (1, 1))).forward(x, 0).shape == (2, 3, 6, 6)
    assert qo.QuantizedExpand((2, 3, 4, 4)).forward(x[:, :, :1, :1], 0).shape[2:] == (4, 4)
    got = qo.QuantizedMaxPool((2, 2)).forward(x, 0)
    assert got.shape == (2, 3, 2, 2)
    np.testing.assert_allclose(got[0, 0, 0, 0], x[0, 0, :2, :2].max())
    cols = qo.QuantizedUnfold((2, 2)).forward(x, 0)
    assert cols.shape == (2, 12, 4)


def test_reduce_and_batchnorm():
    x = rng.normal(0, 1, (4, 3, 2, 2))
    s = qo.QuantizedReduceSum(axis=1).forward(x, 0)
    np.testing.assert_allclose(s, x.sum(axis=1))
    bn = qo.QuantizedBatchNormalization(
        mean=np.array([0.1, -0.2, 0.3]),
        var=np.array([1.0, 2.0, 0.5]),
        gamma=np.array([1.0, 0.5, 2.0]),
        beta=np.array([0.0, 1.0, -1.0]),
    )
    got = bn.forward(x, 0)
    a = bn.gamma / np.sqrt(bn.var + bn.eps)
    want = x * a.reshape(1, 3, 1, 1) + (bn.beta - a * bn.mean).reshape(1, 3, 1, 1)
    np.testing.assert_allclose(got, want)


def test_graph_module_residual_and_where():
    """x -> gemm -> relu -> add(residual x) -> where(gate) : a DAG the
    pipeline executor cannot express."""
    w = rng.normal(0, 0.5, (6, 6))
    nodes = [
        qo.GraphNode(QuantizedGemm(weights=w, bias=None), ("input",)),   # 0
        qo.GraphNode(qo.make_univariate("Relu"), (0,)),                  # 1
        qo.GraphNode(qo.QuantizedAdd(), (1, "input")),                   # 2 residual
        qo.GraphNode(qo.QuantizedGreater(), (2, "input")),               # 3 gate
        qo.GraphNode(qo.QuantizedWhere(), (3, 2, "input")),              # 4
    ]
    gm = qo.QuantizedGraphModule(nodes, n_bits=8)
    x = rng.normal(0, 1, (5, 6))
    gm.calibrate(x)
    got = gm.forward(x, FheMode.DISABLE)
    xq = gm.input_quantizer.dequant(gm.input_quantizer.quant(x))
    # reference: the same ops applied by hand (the Gemm quantizes its
    # weights, so go through the op itself)
    h = np.maximum(nodes[0].op.forward(xq, FheMode.DISABLE), 0) + xq
    want = np.where(h > xq, h, xq)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_graph_module_execute_mode():
    """EXECUTE runs the Gemm under the GLWE engine inside the DAG."""
    w = rng.normal(0, 0.5, (4, 3))
    nodes = [
        qo.GraphNode(QuantizedGemm(weights=w, bias=None), ("input",)),
        qo.GraphNode(qo.make_univariate("Relu"), (0,)),
    ]
    gm = qo.QuantizedGraphModule(nodes, n_bits=8)
    x = rng.normal(0, 1, (2, 4))
    gm.calibrate(x)
    gm.compile(seed=3)
    clear = gm.forward(x, FheMode.DISABLE)
    enc = gm.forward(x, FheMode.EXECUTE)
    span = float(np.abs(clear).max()) or 1.0
    assert np.max(np.abs(clear - enc)) <= 0.1 * span + 0.1


def test_comparisons_and_binops():
    a = rng.normal(0, 1, (3, 4))
    b = rng.normal(0, 1, (3, 4))
    assert (qo.QuantizedLessOrEqual().forward(a, b, fhe=0) == (a <= b)).all()
    assert (qo.QuantizedEqual().forward(a, a, fhe=0) == 1).all()
    np.testing.assert_allclose(qo.QuantizedMin().forward(a, b, fhe=0), np.minimum(a, b))
    np.testing.assert_allclose(qo.QuantizedDiv().forward(a, np.abs(b) + 1, fhe=0), a / (np.abs(b) + 1))
    c = qo.QuantizedConcat(axis=1, n_inputs=2).forward(a, b, fhe=0)
    assert c.shape == (3, 8)
