"""FHE-offloaded LoRA fine-tuning.

Analog of the reference's LoRA stack (reference:
ml/concrete-ml/src/concrete/ml/torch/lora.py LoraTraining :95 /
LoraTrainer :330, hybrid_backprop_linear.py): the frozen base linear
layers run REMOTELY under FHE (their weights never leave the server),
while the low-rank adapters A/B train locally in torch. The backward
pass through the frozen base uses the linear transpose locally -- the
exact trick of hybrid_backprop_linear.py: forward remote, backward with
the (client-known-shape) gradient path, so no PBS in the backward graph.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor


def _make_lora_layer(torch, base_linear, rank: int, alpha: float, n_bits: int, params):
    """Replace nn.Linear with frozen-FHE-base + trainable LoRA adapters."""

    w = base_linear.weight.detach().cpu().numpy().T  # (in, out)
    b = (
        base_linear.bias.detach().cpu().numpy()
        if base_linear.bias is not None
        else None
    )
    executor = GlweLinearLayerExecutor(
        weights=w, bias=b, n_bits_in=n_bits, n_bits_w=n_bits, params=params
    )
    w_t = torch.from_numpy(np.ascontiguousarray(w)).float()  # for backward

    class _FheBaseFn(torch.autograd.Function):
        """Forward through the encrypted executor; backward through the
        clear transpose (reference hybrid_backprop_linear.py)."""

        @staticmethod
        def forward(ctx, x, fhe_mode):
            xp = x.detach().cpu().numpy().astype(np.float64)
            flat = xp.reshape(-1, xp.shape[-1])
            y = executor.forward(flat, fhe=fhe_mode)
            y = y.reshape(*xp.shape[:-1], y.shape[-1])
            return torch.from_numpy(np.ascontiguousarray(y)).to(x.dtype)

        @staticmethod
        def backward(ctx, gy):
            return gy @ w_t.T.to(gy.dtype), None

    class LoraLinear(torch.nn.Module):
        def __init__(self):
            super().__init__()
            in_f, out_f = w.shape
            self.lora_a = torch.nn.Linear(in_f, rank, bias=False)
            self.lora_b = torch.nn.Linear(rank, out_f, bias=False)
            torch.nn.init.normal_(self.lora_a.weight, std=1.0 / rank)
            torch.nn.init.zeros_(self.lora_b.weight)
            self.scaling = alpha / rank
            self.fhe = FheMode.DISABLE
            self.executor = executor

        def forward(self, x):
            base = _FheBaseFn.apply(x, self.fhe)
            return base + self.lora_b(self.lora_a(x)) * self.scaling

    return LoraLinear()


class LoraTraining:
    """Wrap a torch model for LoRA training with FHE-remote base layers
    (reference lora.py LoraTraining). `target_modules`: dotted names of
    nn.Linear layers to adapt (all Linears if None)."""

    def __init__(
        self,
        model,
        rank: int = 4,
        alpha: float = 8.0,
        target_modules: Iterable[str] | None = None,
        n_bits: int = 8,
        params=None,
    ):
        import torch

        self.model = model
        self._lora_layers = {}
        names = (
            list(target_modules)
            if target_modules is not None
            else [
                n
                for n, m in model.named_modules()
                if isinstance(m, torch.nn.Linear)
            ]
        )
        for name in names:
            parent, attr = self._locate(model, name)
            lin = getattr(parent, attr)
            assert isinstance(lin, torch.nn.Linear), f"{name} is not Linear"
            layer = _make_lora_layer(torch, lin, rank, alpha, n_bits, params)
            setattr(parent, attr, layer)
            self._lora_layers[name] = layer
        # freeze everything except adapters
        for p in model.parameters():
            p.requires_grad_(False)
        for layer in self._lora_layers.values():
            layer.lora_a.weight.requires_grad_(True)
            layer.lora_b.weight.requires_grad_(True)

    @staticmethod
    def _locate(model, dotted: str):
        parts = dotted.split(".")
        obj = model
        for p in parts[:-1]:
            obj = getattr(obj, p)
        return obj, parts[-1]

    def compile(self, seed: int = 0):
        for i, layer in enumerate(self._lora_layers.values()):
            layer.executor.keygen(seed + i)
        return self

    def set_fhe_mode(self, fhe: FheMode | str):
        fhe = FheMode.from_any(fhe)
        for layer in self._lora_layers.values():
            layer.fhe = fhe

    def trainable_parameters(self):
        for layer in self._lora_layers.values():
            yield layer.lora_a.weight
            yield layer.lora_b.weight

    def __call__(self, x):
        return self.model(x)


class LoraTrainer:
    """Training-loop driver (reference lora.py LoraTrainer :330)."""

    def __init__(
        self,
        lora_training: LoraTraining,
        loss_fn: Callable | None = None,
        lr: float = 1e-2,
    ):
        import torch

        self.lt = lora_training
        self.loss_fn = loss_fn or torch.nn.MSELoss()
        self.opt = torch.optim.Adam(list(self.lt.trainable_parameters()), lr=lr)

    def train(
        self,
        data: Iterable,
        epochs: int = 1,
        fhe: FheMode | str = FheMode.DISABLE,
    ) -> list:
        """data: iterable of (x, y) torch tensors. Returns per-epoch loss."""
        self.lt.set_fhe_mode(fhe)
        losses = []
        for _ in range(epochs):
            tot, nb = 0.0, 0
            for x, y in data:
                self.opt.zero_grad()
                out = self.lt(x)
                loss = self.loss_fn(out, y)
                loss.backward()
                self.opt.step()
                tot += float(loss.detach())
                nb += 1
            losses.append(tot / max(nb, 1))
        return losses

    def save_adapters(self, path: str):
        import torch

        torch.save(
            {
                name: {
                    "lora_a": layer.lora_a.weight.detach(),
                    "lora_b": layer.lora_b.weight.detach(),
                }
                for name, layer in self.lt._lora_layers.items()
            },
            path,
        )
