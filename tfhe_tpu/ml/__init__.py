from tfhe_tpu.ml.quantization import QuantizedArray, UniformQuantizer
from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor
