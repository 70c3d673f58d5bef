"""Deployment triplet: model packaging, client-side crypto, server-side run.

Analog of the reference's FHEModelDev / FHEModelClient / FHEModelServer
(reference: ml/concrete-ml/src/concrete/ml/deployment/fhe_client_server.py
:110,239,368 -- dev saves a zip of circuit + quantizers; client does keygen,
quantize_encrypt_serialize:491 and deserialize_decrypt_dequantize:578;
server loads the artifact and run():157 executes on serialized inputs plus
serialized evaluation keys).

Artifact layout (zip): model.json (quantizers + params + meta),
weights.npy (quantized weights), bias.npy.
"""

from __future__ import annotations

import io
import json
import pathlib
import zipfile

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ml.quantization import UniformQuantizer
from tfhe_tpu.models import glwe_matmul as gm
from tfhe_tpu.params import MatmulParams
from tfhe_tpu.utils import serialization

ARTIFACT = "model.zip"


class FHEModelDev:
    """Package a fitted linear executor for deployment."""

    def __init__(self, path: str, model):
        self.path = pathlib.Path(path)
        self.model = model  # _LinearBase or GlweLinearLayerExecutor

    def save(self):
        ex = getattr(self.model, "_executor", None) or self.model
        self.path.mkdir(parents=True, exist_ok=True)
        meta = {
            "params": ex.params.to_json(),
            "params_name": ex.params.name,
            "n_bits_in": ex.n_bits_in,
            "w_quant": ex.w_quant.to_dict(),
            "has_bias": ex.bias is not None,
        }
        with zipfile.ZipFile(self.path / ARTIFACT, "w") as z:
            z.writestr("model.json", json.dumps(meta))
            buf = io.BytesIO()
            np.save(buf, ex.w_q)
            z.writestr("weights.npy", buf.getvalue())
            if ex.bias is not None:
                buf = io.BytesIO()
                np.save(buf, np.asarray(ex.bias, np.float64))
                z.writestr("bias.npy", buf.getvalue())


def _load(path) -> tuple:
    with zipfile.ZipFile(pathlib.Path(path) / ARTIFACT) as z:
        meta = json.loads(z.read("model.json"))
        w_q = np.load(io.BytesIO(z.read("weights.npy")))
        bias = (
            np.load(io.BytesIO(z.read("bias.npy"))) if meta["has_bias"] else None
        )
    from tfhe_tpu import params as tp

    params = tp.by_name(meta["params_name"])
    return meta, w_q, bias, params


class FHEModelClient:
    """Key generation, input encryption, output decryption."""

    def __init__(self, path: str, key_seed: int = 0):
        self.meta, self.w_q, self.bias, self.params = _load(path)
        self._pkey = gm.create_private_key(self.params, seed=key_seed)
        self.w_quant = UniformQuantizer.from_dict(self.meta["w_quant"])

    def get_serialized_evaluation_keys(self) -> bytes:
        """The packing keyswitch key: all the server needs."""
        return serialization.serialize(self._pkey.pksk)

    def quantize_encrypt_serialize(self, x: np.ndarray) -> tuple[bytes, dict]:
        xq = UniformQuantizer(self.meta["n_bits_in"], is_signed=False).fit(x)
        x_q = xq.quant(np.asarray(x, np.float64))
        enc = gm.encrypt_matrix(self._pkey, jnp.asarray(x_q.astype(np.uint64)))
        ctx = {"scale": float(xq.scale), "zero_point": float(xq.zero_point)}
        return serialization.serialize(enc), ctx

    def deserialize_decrypt_dequantize(self, blob: bytes, ctx: dict) -> np.ndarray:
        res = serialization.deserialize(blob)
        acc = np.asarray(gm.decrypt_matrix(res, self._pkey)).astype(np.float64)
        w_col = self.w_q.sum(axis=0).astype(np.float64)
        acc = acc - ctx["zero_point"] * w_col
        y = acc * ctx["scale"] * np.asarray(self.w_quant.scale, np.float64)
        if self.bias is not None:
            y = y + self.bias
        return y


class FHEModelServer:
    """Stateless encrypted inference on serialized inputs."""

    def __init__(self, path: str):
        self.meta, self.w_q, self.bias, self.params = _load(path)

    def run(self, serialized_input: bytes, serialized_evaluation_keys: bytes) -> bytes:
        enc = serialization.deserialize(serialized_input)
        pksk = serialization.deserialize(serialized_evaluation_keys)
        import dataclasses as _dc

        # server-side key view: only the public packing key, no secrets
        fake_key = type("ServerKeyView", (), {"pksk": pksk})()
        res = gm.matrix_multiplication(enc, jnp.asarray(self.w_q), fake_key)
        return serialization.serialize(res)
