"""Hybrid-model remote serving: the reference's HybridFHEModelServer
protocol (ml/concrete-ml/src/concrete/ml/torch/hybrid_model.py:821) over
a real socket: register private linear layers server-side, client
fetches per-module artifacts + uploads evaluation keys, activations
cross the wire only encrypted, and the end-to-end hybrid forward matches
the local model within quantization error."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from tfhe_tpu.ml.hybrid import RemoteHybridModel, serve_hybrid_model
from tfhe_tpu.ml.hybrid_server import (
    HTTPTransport,
    HybridFHEModelServer,
    HybridHTTPServer,
)


@pytest.fixture(scope="module")
def net():
    torch.manual_seed(0)
    return nn.Sequential(
        nn.Linear(6, 16), nn.ReLU(), nn.Linear(16, 4)
    ).eval()


@pytest.fixture(scope="module")
def http_stack(net):
    from tfhe_tpu import params

    core = HybridFHEModelServer()
    serve_hybrid_model(net, ["0", "2"], "tiny", core,
                       params=params.TOY_MATMUL)
    httpd = HybridHTTPServer(core).start()
    yield core, HTTPTransport(f"http://127.0.0.1:{httpd.port}")
    httpd.stop()


def test_list_and_artifact(http_stack):
    core, transport = http_stack
    assert transport.list_modules("tiny") == ["0", "2"]
    blob = transport.get_client("tiny", "0")
    assert blob[:2] == b"PK"  # the deployment artifact zip


def test_remote_forward_matches_local(net, http_stack):
    _, transport = http_stack
    x = torch.tensor(
        np.random.default_rng(3).normal(0, 1, (5, 6)), dtype=torch.float32
    )
    want = net(x).detach().numpy()

    # client builds the SAME architecture; swapped layers' local weights
    # are discarded (the server owns them)
    client_net = nn.Sequential(nn.Linear(6, 16), nn.ReLU(), nn.Linear(16, 4))
    remote = RemoteHybridModel(client_net, ["0", "2"], "tiny", transport)
    got = remote(x).detach().numpy()
    scale = np.abs(want).max() or 1.0
    assert np.abs(got - want).max() / scale < 0.25, (got, want)


def test_unknown_module_404(http_stack):
    _, transport = http_stack
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        transport.get_client("tiny", "nope")


def test_key_isolation(http_stack):
    """compute with a never-registered uid fails (no key on server)."""
    core, _ = http_stack
    with pytest.raises(KeyError):
        core.compute(b"x", "no-such-uid", "tiny", "0")
