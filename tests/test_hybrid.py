"""Hybrid torch model: selected linear layers run under FHE."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tfhe_tpu import params
from tfhe_tpu.ml.hybrid import HybridFHEModel
from tfhe_tpu.ml.p_error_search import binary_search_p_error

P = params.TOY_MATMUL


def _net():
    torch.manual_seed(0)
    return torch.nn.Sequential(
        torch.nn.Linear(16, 32),
        torch.nn.ReLU(),
        torch.nn.Linear(32, 4),
    )


def test_hybrid_disable_close_to_float():
    net = _net()
    x = torch.rand(5, 16)
    y_ref = net(x).detach().numpy()
    hybrid = HybridFHEModel(_net(), ["0", "2"], params=P)
    y = hybrid(x, fhe="disable").detach().numpy()
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.1  # 8-bit quantization error only


def test_hybrid_execute_matches_disable():
    net = _net()
    hybrid = HybridFHEModel(net, ["0", "2"], params=P).compile(seed=3)
    x = torch.rand(2, 16)
    y0 = hybrid(x, fhe="disable").detach().numpy()
    y1 = hybrid(x, fhe="execute").detach().numpy()
    np.testing.assert_allclose(y1, y0, atol=1e-5)


def test_p_error_search_converges():
    def eval_fn(p_error):
        # monotone toy accuracy curve: high accuracy until p_error ~ 2^-10
        import math

        return 0.99 if p_error < 2**-10 else 0.8

    res = binary_search_p_error(eval_fn, target_accuracy=0.99, tolerance=0.005)
    assert res.accuracy >= 0.985
    assert 2**-14 < res.p_error < 2**-9
