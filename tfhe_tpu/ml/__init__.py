from tfhe_tpu.ml.quantization import QuantizedArray, UniformQuantizer
from tfhe_tpu.ml.common import FheMode
from tfhe_tpu.ml.linear import GlweLinearLayerExecutor
from tfhe_tpu.ml.serialization import dump, dumps, load, loads
from tfhe_tpu.ml.quantized_module import (
    QuantizedModule,
    QuantizedGemm,
    QuantizedConv,
    QuantizedTLU,
    compile_torch_model,
    compile_onnx_model,
    compile_brevitas_qat_model,
)
from tfhe_tpu.ml.sklearn import (
    ElasticNet,
    Lasso,
    LinearRegression,
    LogisticRegression,
    Ridge,
    SGDRegressor,
)
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
from tfhe_tpu.ml.quantization import get_n_bits_dict
from tfhe_tpu.ml.hybrid import (
    HybridFHEModel,
    RemoteHybridModel,
    serve_hybrid_model,
)
from tfhe_tpu.ml.hybrid_server import (
    HTTPTransport,
    HybridFHEModelServer,
    HybridHTTPServer,
)
from tfhe_tpu.ml.torch_export import (
    compile_torch_model_via_onnx,
    export_onnx_bytes,
)


# -- model registry (reference sklearn/__init__.py get_sklearn_models etc.) ----

_LINEAR_MODELS = [
    ElasticNet, Lasso, LinearRegression, LogisticRegression, Ridge,
    SGDClassifier, SGDRegressor, LinearSVC, LinearSVR,
    GammaRegressor, PoissonRegressor, TweedieRegressor,
]
_TREE_MODELS = [
    DecisionTreeClassifier, DecisionTreeRegressor,
    RandomForestClassifier, RandomForestRegressor,
    XGBClassifier, XGBRegressor,
]
_NEURALNET_MODELS = [NeuralNetClassifier, NeuralNetRegressor]
_NEIGHBOR_MODELS = [KNeighborsClassifier]


def get_sklearn_linear_models() -> list:
    """reference sklearn/__init__.py:124"""
    return sorted(_LINEAR_MODELS, key=lambda c: c.__name__)


def get_sklearn_tree_models() -> list:
    """reference sklearn/__init__.py:156"""
    return sorted(_TREE_MODELS, key=lambda c: c.__name__)


def get_sklearn_neural_net_models() -> list:
    """reference sklearn/__init__.py:181"""
    return sorted(_NEURALNET_MODELS, key=lambda c: c.__name__)


def get_sklearn_neighbors_models() -> list:
    """reference sklearn/__init__.py:213"""
    return sorted(_NEIGHBOR_MODELS, key=lambda c: c.__name__)


def get_sklearn_all_models() -> list:
    """reference sklearn/__init__.py:245"""
    return sorted(
        _LINEAR_MODELS + _TREE_MODELS + _NEURALNET_MODELS + _NEIGHBOR_MODELS,
        key=lambda c: c.__name__,
    )
