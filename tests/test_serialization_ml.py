"""Model serialization + sklearn estimator protocol.

Mirrors the reference's serialization tests (reference:
ml/concrete-ml/src/concrete/ml/common/serialization/: dumps/loads of
every fitted model through type-tagged JSON; sklearn/base.py
get_params/set_params protocol): every zoo model round-trips through a
JSON string, the reloaded model predicts identically in DISABLE mode
(and for one model, under EXECUTE after a fresh compile -- keys are
never serialized), and the estimators satisfy sklearn's clone/get_params
contract.
"""

import json

import numpy as np
import pytest

from tfhe_tpu.ml import (
    DecisionTreeClassifier,
    ElasticNet,
    KNeighborsClassifier,
    Lasso,
    LinearRegression,
    LinearSVC,
    LogisticRegression,
    NeuralNetClassifier,
    PoissonRegressor,
    RandomForestClassifier,
    Ridge,
    SGDClassifier,
    SGDRegressor,
    XGBClassifier,
    XGBRegressor,
    compile_torch_model,
    dumps,
    get_sklearn_all_models,
    get_sklearn_linear_models,
    get_sklearn_tree_models,
    loads,
)
from tfhe_tpu.ml.quantization import UniformQuantizer
from tfhe_tpu.ml.serialization import dumps as ser_dumps


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (64, 6))
    w = rng.normal(0, 1, 6)
    y_reg = X @ w + 0.1 * rng.normal(0, 1, 64)
    y_cls = (X @ w > 0).astype(int)
    return X, y_reg, y_cls


def _roundtrip(model):
    s = model.dumps()
    json.loads(s)  # must be valid JSON
    return loads(s)


REGRESSORS = [LinearRegression, Ridge, Lasso, ElasticNet, SGDRegressor]
CLASSIFIERS = [LogisticRegression, LinearSVC, SGDClassifier]


@pytest.mark.parametrize("cls", REGRESSORS)
def test_regressor_roundtrip(cls, data):
    X, y, _ = data
    m = cls().fit(X, y)
    m2 = _roundtrip(m)
    assert type(m2) is cls
    np.testing.assert_allclose(m2.predict(X), m.predict(X))


@pytest.mark.parametrize("cls", CLASSIFIERS)
def test_classifier_roundtrip(cls, data):
    X, _, y = data
    m = cls().fit(X, y)
    m2 = _roundtrip(m)
    assert (m2.predict(X) == m.predict(X)).all()
    assert (m2.classes_ == m.classes_).all()


def test_glm_roundtrip(data):
    X, y, _ = data
    m = PoissonRegressor().fit(X, np.exp(0.1 * y).round() + 1)
    m2 = _roundtrip(m)
    np.testing.assert_allclose(m2.predict(X), m.predict(X))


def test_knn_roundtrip(data):
    X, _, y = data
    m = KNeighborsClassifier(n_neighbors=3).fit(X, y)
    m2 = _roundtrip(m)
    assert (m2.predict(X) == m.predict(X)).all()


@pytest.mark.parametrize(
    "cls", [DecisionTreeClassifier, RandomForestClassifier, XGBClassifier]
)
def test_tree_classifier_roundtrip(cls, data):
    X, _, y = data
    m = cls(n_bits=6, max_depth=3).fit(X, y)
    m2 = _roundtrip(m)
    assert (m2.predict(X) == m.predict(X)).all()
    np.testing.assert_allclose(m2.predict_proba(X), m.predict_proba(X))


def test_tree_regressor_roundtrip(data):
    X, y, _ = data
    m = XGBRegressor(n_bits=6, max_depth=3, n_estimators=10).fit(X, y)
    m2 = _roundtrip(m)
    np.testing.assert_allclose(m2.predict(X), m.predict(X))


def test_qnn_roundtrip(data):
    X, _, y = data
    m = NeuralNetClassifier(hidden=(8,), epochs=30).fit(X, y)
    m2 = _roundtrip(m)
    assert (m2.predict(X) == m.predict(X)).all()


def test_quantized_module_roundtrip(data):
    """compile_torch_model -> dumps -> loads predicts identically,
    including baked anonymous TLUs."""
    import torch.nn as nn

    X, _, _ = data
    net = nn.Sequential(nn.Linear(6, 8), nn.ReLU(), nn.Linear(8, 2))
    qm = compile_torch_model(net, X.astype(np.float32), n_bits=6)
    qm2 = loads(ser_dumps(qm))
    np.testing.assert_allclose(qm2.forward(X), qm.forward(X))
    # the quantized (simulate-shaped) path must also agree
    np.testing.assert_allclose(
        qm2.forward(X, fhe="simulate"), qm.forward(X, fhe="simulate")
    )


def test_execute_after_reload(data):
    """Keys are NOT serialized; a reloaded model compiles fresh keys and
    EXECUTE matches DISABLE within quantization error (the reference's
    load-then-compile contract)."""
    X, y, _ = data
    m2 = _roundtrip(LinearRegression(n_bits=8).fit(X, y))
    m2.compile(seed=5)
    clear = m2.predict(X[:4])
    enc = m2.predict(X[:4], fhe="execute")
    scale = np.abs(clear).max() or 1.0
    assert np.abs(enc - clear).max() / scale < 0.12


def test_primitive_roundtrips():
    q = UniformQuantizer(6, is_signed=True).fit(np.linspace(-3, 5, 50))
    q2 = loads(ser_dumps(q))
    v = np.linspace(-4, 6, 17)
    np.testing.assert_allclose(q2.quant(v), q.quant(v))
    arr = np.arange(12, dtype=np.uint64).reshape(3, 4)
    arr2 = loads(ser_dumps({"a": arr, "t": (1, "x", arr)}))
    assert (arr2["a"] == arr).all() and arr2["a"].dtype == arr.dtype
    assert isinstance(arr2["t"], tuple) and (arr2["t"][2] == arr).all()
    from tfhe_tpu import params as tp

    p = loads(ser_dumps(tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128))
    assert p is tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128


def test_sklearn_params_protocol(data):
    """get_params/set_params satisfy the sklearn contract: sklearn.clone
    reconstructs an unfitted copy; GridSearchCV-style set_params works."""
    from sklearn.base import clone

    X, y, _ = data
    m = Ridge(n_bits=7, alpha=2.5)
    p = m.get_params()
    assert p["n_bits"] == 7 and p["alpha"] == 2.5
    c = clone(m)
    assert c.get_params()["alpha"] == 2.5
    m.set_params(alpha=0.5, n_bits=6)
    assert m.get_params()["alpha"] == 0.5 and m.n_bits == 6
    m.fit(X, y)
    assert m.predict(X[:3]).shape == (3,)


def test_model_registry():
    """reference sklearn/__init__.py model listing helpers."""
    allm = get_sklearn_all_models()
    assert len(allm) == 21
    assert Ridge in get_sklearn_linear_models()
    assert XGBClassifier in get_sklearn_tree_models()
    names = [c.__name__ for c in allm]
    assert names == sorted(names)


def test_unknown_type_fails_closed():
    with pytest.raises(TypeError, match="not serializable"):
        ser_dumps(object())
    with pytest.raises(ValueError, match="unknown serialized type"):
        loads('{"type_name": "NoSuchThing", "serialized_value": {}}')
