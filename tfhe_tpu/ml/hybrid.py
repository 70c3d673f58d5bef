"""Hybrid FHE model: run selected torch linear layers encrypted.

Analog of the reference's HybridFHEModel (reference:
ml/concrete-ml/src/concrete/ml/torch/hybrid_model.py:106,379,587 -- wrap a
torch network, swap named nn.Linear modules for remote/FHE executors, keep
the rest local) and its server half (:821 HybridFHEModelServer). Used for
LLM-style deployments where only the projection matrices are private.

The swapped layer routes through GlweLinearLayerExecutor; `fhe=` selects
disable/simulate/execute per call, mirroring RemoteModule behavior.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor


class _FheLinear:
    """torch.nn.Module stand-in executing Linear under FHE."""

    def __init__(self, linear, params, n_bits: int):
        import torch

        w = linear.weight.detach().cpu().numpy().T  # (in, out)
        b = (
            linear.bias.detach().cpu().numpy()
            if linear.bias is not None
            else None
        )
        self.executor = GlweLinearLayerExecutor(
            weights=w, bias=b, n_bits_in=n_bits, n_bits_w=n_bits, params=params
        )
        self.fhe = FheMode.DISABLE
        self._torch = torch

    def __call__(self, x):
        xp = x.detach().cpu().numpy()
        shape = xp.shape
        flat = xp.reshape(-1, shape[-1])
        y = self.executor.forward(flat, fhe=self.fhe)
        return self._torch.from_numpy(
            np.ascontiguousarray(y.reshape(*shape[:-1], y.shape[-1]))
        ).to(x.dtype)


class HybridFHEModel:
    """Wraps a torch module; `module_names` linear layers run under FHE."""

    def __init__(self, model, module_names: Iterable[str], params=None, n_bits: int = 8):
        import torch

        self.model = model
        self.module_names = list(module_names)
        self._fhe_layers: dict[str, _FheLinear] = {}
        for name in self.module_names:
            parent, attr = self._locate(model, name)
            lin = getattr(parent, attr)
            assert isinstance(lin, torch.nn.Linear), f"{name} is not Linear"
            fhe_lin = _FheLinear(lin, params, n_bits)
            self._fhe_layers[name] = fhe_lin
            setattr(parent, attr, _TorchShim(fhe_lin))

    @staticmethod
    def _locate(model, dotted: str):
        parts = dotted.split(".")
        obj = model
        for p in parts[:-1]:
            obj = getattr(obj, p)
        return obj, parts[-1]

    def compile(self, seed: int = 0):
        """Generate keys for every FHE layer."""
        for i, layer in enumerate(self._fhe_layers.values()):
            layer.executor.keygen(seed + i)
        return self

    def forward(self, x, fhe: FheMode | str = FheMode.DISABLE):
        fhe = FheMode.from_any(fhe)
        for layer in self._fhe_layers.values():
            layer.fhe = fhe
        return self.model(x)

    __call__ = forward


def serve_hybrid_model(model, module_names: Iterable[str], model_name: str,
                       server, params=None) -> None:
    """Server side of the hybrid deployment: register every named
    nn.Linear of `model` with a HybridFHEModelServer (reference
    hybrid_model.py:379 compile_model + :821 server registry). The
    weights live only on the server after this. `params` picks the
    GLWE matmul parameter set (default: production)."""
    import torch

    for name in module_names:
        parent, attr = HybridFHEModel._locate(model, name)
        lin = getattr(parent, attr)
        assert isinstance(lin, torch.nn.Linear), f"{name} is not Linear"
        server.register(model_name, name, lin, params=params)


class RemoteHybridModel:
    """Client half: a torch model whose named linear layers are executed
    REMOTELY over a transport (reference RemoteModule,
    hybrid_model.py:122: activations encrypted client-side, weights never
    leave the server). The local copies of the swapped layers are
    discarded -- their parameters are irrelevant."""

    def __init__(self, model, module_names: Iterable[str], model_name: str,
                 transport, key_seed: int = 0):
        import torch

        from tfhe_tpu.ml.hybrid_server import RemoteModule

        self.model = model
        self.remotes: dict[str, RemoteModule] = {}
        for name in module_names:
            parent, attr = HybridFHEModel._locate(model, name)
            remote = RemoteModule(transport, model_name, name, key_seed=key_seed)
            self.remotes[name] = remote

            class _RemoteShim(torch.nn.Module):
                def __init__(self, r):
                    super().__init__()
                    self._remote = r

                def forward(self, x):
                    xp = x.detach().cpu().numpy()
                    y = self._remote.forward(xp)
                    return torch.from_numpy(np.ascontiguousarray(y)).to(x.dtype)

            setattr(parent, attr, _RemoteShim(remote))

    def forward(self, x):
        return self.model(x)

    __call__ = forward


def _TorchShim(fhe_linear: _FheLinear):
    """nn.Module wrapper so the swapped layer composes inside Sequential,
    state traversal, etc."""
    import torch

    class FheLinearModule(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fhe_linear = fhe_linear

        def forward(self, x):
            return self.fhe_linear(x)

    return FheLinearModule()
