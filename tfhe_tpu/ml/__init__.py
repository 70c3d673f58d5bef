from tfhe_tpu.ml.quantization import QuantizedArray, UniformQuantizer
from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor
from tfhe_tpu.ml.quantized_module import (
    QuantizedModule,
    QuantizedGemm,
    QuantizedConv,
    QuantizedTLU,
    compile_torch_model,
    compile_onnx_model,
    compile_brevitas_qat_model,
)
from tfhe_tpu.ml.sklearn import LinearRegression, LogisticRegression
from tfhe_tpu.ml.tree import (
    DecisionTreeClassifier,
    DecisionTreeRegressor,
    RandomForestClassifier,
    RandomForestRegressor,
    XGBClassifier,
    XGBRegressor,
)
from tfhe_tpu.ml.zoo import (
    GammaRegressor,
    KNeighborsClassifier,
    LinearSVC,
    LinearSVR,
    NeuralNetClassifier,
    NeuralNetRegressor,
    PoissonRegressor,
    SGDClassifier,
    TweedieRegressor,
)
