"""Encrypted linear-layer executor over the GLWE matmul engine.

Analog of the reference's GLWELinearLayerExecutor (reference:
ml/concrete-ml/src/concrete/ml/quantization/linear_op_glwe_backend.py:
dynamic activation quantization, keygen at :62-68, default N=2048/27-bit
params at :52-58, matmul via the native extension). Here the backend is
tfhe_tpu.models.glwe_matmul (exact NTT engine) and the three execution
modes run the same integer pipeline so DISABLE/SIMULATE are faithful
predictors of EXECUTE.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.quantization import UniformQuantizer
from tfhe_tpu.models import glwe_matmul as gm
from tfhe_tpu.params import MatmulParams
from tfhe_tpu.rng import FheRng


@dataclasses.dataclass
class GlweLinearLayerExecutor:
    weights: np.ndarray  # (C, O) float
    bias: np.ndarray | None = None  # (O,)
    n_bits_in: int = 8
    n_bits_w: int = 8
    params: MatmulParams | None = None
    exact_int_weights: bool = False  # weights already small ints: scale 1
    _pkey: object = None

    def __post_init__(self):
        if self.params is None:
            self.params = gm.default_params()
        self.w_quant = UniformQuantizer(self.n_bits_w, is_signed=True)
        if self.exact_int_weights:
            # 0/±1 selector matrices (tree lowering) and pre-quantized
            # integer weights must not be rescaled
            self.w_quant.scale = np.float64(1.0)
            self.w_quant.zero_point = np.float64(0.0)
        else:
            # symmetric quantization (zero_point 0) keeps the encrypted
            # accumulation free of weight offsets; the scale must then be
            # max|w|/qmax, NOT the asymmetric fit (which clips one-sided
            # weight matrices)
            amax = float(np.abs(np.asarray(self.weights, np.float64)).max())
            self.w_quant.scale = np.float64(amax / self.w_quant.qmax or 1.0)
            self.w_quant.zero_point = np.float64(0.0)
        self.w_q = self.w_quant.quant(self.weights)

    def keygen(self, seed: int = 0):
        self._pkey = gm.create_private_key(self.params, seed=seed)
        return self

    def forward(self, x: np.ndarray, fhe: FheMode | str = FheMode.DISABLE) -> np.ndarray:
        """x: (B, C) float -> (B, O) float."""
        fhe = FheMode.from_any(fhe)
        x = np.asarray(x, dtype=np.float64)
        xq = UniformQuantizer(self.n_bits_in, is_signed=False).fit(x)
        # exposed for consumers that must reason on the integer grid
        # (tree threshold snapping): the quantizer is batch-dynamic
        self.last_input_quantizer = xq
        x_q = xq.quant(x)  # (B, C) in [0, 2^b)

        if fhe == FheMode.EXECUTE:
            assert self._pkey is not None, "call keygen() first"
            enc = gm.encrypt_matrix(self._pkey, jnp.asarray(x_q.astype(np.uint64)))
            res = gm.matrix_multiplication(enc, jnp.asarray(self.w_q), self._pkey)
            acc = np.asarray(gm.decrypt_matrix(res, self._pkey)).astype(np.float64)
        else:
            acc = (x_q.astype(np.float64) @ self.w_q.astype(np.float64))
            if fhe == FheMode.SIMULATE:
                # analytic noise profile (noise.find_noise_profile, the
                # closed-form analog of the reference's empirical
                # noise_profiles keyed by params hash): std in units of the
                # accumulator LSB, dominated by the output storage
                # modulus-switch rounding
                from tfhe_tpu.noise import find_noise_profile

                std = find_noise_profile(self.params, x.shape[-1])
                # the accumulator is scaled to the compute-bit LSB already
                rs = np.random.RandomState(0)
                acc = acc + rs.normal(0.0, std, size=acc.shape).round()

        # undo the input zero-point with the clear per-column weight sums
        w_col = self.w_q.sum(axis=0).astype(np.float64)
        acc = acc - float(xq.zero_point) * w_col
        y = acc * float(xq.scale) * np.asarray(self.w_quant.scale, np.float64)
        if self.bias is not None:
            y = y + np.asarray(self.bias, np.float64)
        return y
