"""Remote hybrid model serving demo.

The deployment story of the reference's HybridFHEModel (reference:
ml/concrete-ml/src/concrete/ml/torch/hybrid_model.py — RemoteModule
:122, HybridFHEModelServer :821): a provider keeps PRIVATE linear
layers server-side; clients run the rest of the network locally and
call the private layers over HTTP with encrypted activations. Weights
never leave the server; activations never leave the client in clear.

Run: python examples/hybrid_serving_demo.py  (CPU, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn

from tfhe_tpu import params
from tfhe_tpu.ml.hybrid import RemoteHybridModel, serve_hybrid_model
from tfhe_tpu.ml.hybrid_server import (
    HTTPTransport,
    HybridFHEModelServer,
    HybridHTTPServer,
)


def main():
    torch.manual_seed(0)

    # ---- provider side: the model with its private weights ----
    net = nn.Sequential(
        nn.Linear(10, 32), nn.ReLU(),
        nn.Linear(32, 32), nn.ReLU(),
        nn.Linear(32, 3),
    ).eval()

    server_core = HybridFHEModelServer()
    # expose layers 0 and 2 as FHE-remote; layer 4 ships to clients
    serve_hybrid_model(net, ["0", "2"], "demo-mlp", server_core,
                       params=params.TOY_MATMUL)
    httpd = HybridHTTPServer(server_core).start()
    print(f"server listening on 127.0.0.1:{httpd.port}, "
          f"modules: {server_core.list_modules('demo-mlp')}")

    # ---- client side: same architecture, swapped layers are remote ----
    transport = HTTPTransport(f"http://127.0.0.1:{httpd.port}")
    client_net = nn.Sequential(
        nn.Linear(10, 32), nn.ReLU(),
        nn.Linear(32, 32), nn.ReLU(),
        nn.Linear(32, 3),
    )
    # the local copies of layers 0/2 are discarded; only layer 4's
    # weights matter client-side -- copy it from the provider's export
    client_net[4].load_state_dict(net[4].state_dict())
    remote = RemoteHybridModel(client_net, ["0", "2"], "demo-mlp",
                               transport)

    x = torch.tensor(
        np.random.default_rng(7).normal(0, 1, (4, 10)), dtype=torch.float32
    )
    got = remote(x).detach().numpy()
    want = net(x).detach().numpy()
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"remote forward matches local within quantization: "
          f"rel err {rel:.4f}")
    assert rel < 0.25
    httpd.stop()
    print("OK")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
