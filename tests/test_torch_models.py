"""Torch model zoo sweep: torch -> onnx (stubbed export) -> quantized
DAG conformance for every model family in ml/torch_models.py (the
reference sweeps its pytest/torch_models.py zoo through
compile_torch_model the same way). DISABLE output must track the float
model within quantization error; one model also checks SIMULATE shape
and the EXECUTE compile path."""

import numpy as np
import pytest
import torch

from tfhe_tpu.ml import torch_models as zoo
from tfhe_tpu.ml.torch_export import (
    compile_torch_model_via_onnx,
    export_onnx_bytes,
)
from tfhe_tpu.ml.onnx_frontend import compile_onnx_model

RNG = np.random.default_rng(11)


def _vec(shape):
    return RNG.normal(0, 1, shape).astype(np.float32)


# (model factory, calibration input shape, rel-err tolerance)
CASES = [
    (zoo.FCSmall, (24, 5), 0.06),
    (zoo.FC, (24, 8), 0.08),
    (zoo.CNN, (8, 1, 8, 8), 0.12),
    (zoo.CNNMaxPool, (8, 1, 8, 8), 0.12),
    (zoo.TinyCNN, (8, 1, 10, 10), 0.15),
    (zoo.BranchingModule, (24, 6), 0.06),
    (zoo.BranchingGemmModule, (24, 6), 0.08),
    (zoo.UnivariateModule, (24, 6), 0.06),
    (zoo.StepActivationModule, (24, 6), 0.30),  # steps quantize hard
    (zoo.NetWithConcatUnsqueeze, (24, 5), 0.08),
    (zoo.TorchSum, (24, 6), 0.05),
    (zoo.WhereNet, (24, 6), 0.06),
    (zoo.AddNet, (24, 6), 0.05),
    (zoo.ExpandModel, (24, 6), 0.06),
    (zoo.PaddingNet, (24, 8), 0.08),
    (zoo.ShapeOperationsNet, (24, 8), 0.05),
    (zoo.MultiOpOnSingleInputConvNN, (8, 1, 8, 8), 0.12),
]


@pytest.mark.parametrize(
    "factory,shape,tol", CASES, ids=[c[0].__name__ for c in CASES]
)
def test_zoo_model_lowers_and_tracks_float(factory, shape, tol):
    torch.manual_seed(0)
    net = factory().eval()
    x = _vec(shape)
    qm = compile_torch_model_via_onnx(net, x, n_bits=8, keygen=False)
    got = qm.forward(x.astype(np.float64))
    # DISABLE semantics: the float function ON THE QUANTIZED INPUT GRID
    # (discontinuous models would otherwise differ at box boundaries)
    q = qm.input_quantizer
    xq = q.dequant(q.quant(x.astype(np.float64))).astype(np.float32)
    want = net(torch.tensor(xq)).detach().numpy()
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / scale < tol, (
        factory.__name__,
        np.abs(got - want).max() / scale,
    )


def test_multi_input_model():
    """Two graph inputs (reference MultiInputNN :330): per-input
    quantizers, tuple forward."""
    torch.manual_seed(0)
    net = zoo.MultiInputNN().eval()
    x, y = _vec((24, 5)), _vec((24, 5))
    blob = export_onnx_bytes(
        net, (torch.tensor(x[:1]), torch.tensor(y[:1]))
    )
    qm = compile_onnx_model(blob, (x, y), n_bits=8, keygen=False)
    got = qm.forward((x.astype(np.float64), y.astype(np.float64)))
    want = net(torch.tensor(x), torch.tensor(y)).detach().numpy()
    scale = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / scale < 0.08


def test_embedding_gather():
    torch.manual_seed(0)
    net = zoo.EmbeddingModel().eval()
    idx = RNG.integers(0, 8, (16, 3))
    blob = export_onnx_bytes(net, (torch.tensor(idx[:1]),))
    qm = compile_onnx_model(blob, idx.astype(np.float64), n_bits=8, keygen=False)
    got = qm.forward(idx.astype(np.float64))
    want = net(torch.tensor(idx)).detach().numpy()
    scale = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / scale < 0.08


def test_simulate_and_execute_paths():
    from tfhe_tpu import params

    torch.manual_seed(0)
    net = zoo.FCSmall().eval()
    x = _vec((16, 5))
    qm = compile_torch_model_via_onnx(net, x, n_bits=7,
                                      params=params.TOY_MATMUL)
    sim = qm.forward(x.astype(np.float64), fhe="simulate")
    assert sim.shape == (16, 5)
    enc = qm.forward(x[:2].astype(np.float64), fhe="execute")
    clear = qm.forward(x[:2].astype(np.float64))
    scale = np.abs(clear).max() or 1.0
    assert np.abs(enc - clear).max() / scale < 0.15


def test_reduce_sum_multi_axis_and_all():
    """Opset-13 ReduceSum edge semantics: multi-axis lists reduce
    jointly; MISSING axes reduce everything (both silently truncated to
    one axis before round 3)."""

    class MultiAxis(torch.nn.Module):
        def forward(self, x):
            return x.sum(dim=(1, 2))

    class All(torch.nn.Module):
        def forward(self, x):
            return x.sum()

    x = _vec((6, 3, 4))
    for net in (MultiAxis().eval(), All().eval()):
        blob = export_onnx_bytes(net, (torch.tensor(x[:1]),))
        qm = compile_onnx_model(blob, x, n_bits=8, keygen=False)
        got = qm.forward(x.astype(np.float64))
        q = qm.input_quantizer
        xq = q.dequant(q.quant(x.astype(np.float64))).astype(np.float32)
        want = net(torch.tensor(xq)).detach().numpy()
        assert np.shape(got) == np.shape(want), (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_single_input_list_data_is_not_a_bundle():
    """A plain nested list is DATA for a single-input graph, not a
    multi-input tuple (regression: each row became its own input)."""
    net = zoo.FCSmall().eval()
    x = _vec((12, 5))
    qm = compile_torch_model_via_onnx(net, x.tolist(), n_bits=8,
                                      keygen=False)
    got = qm.forward(x.astype(np.float64).tolist())
    assert np.shape(got) == (12, 5)
