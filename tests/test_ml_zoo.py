"""Model-zoo coverage: torch compile pipeline, trees, SVM/GLM/KNN/SGD/QNN.

Mirrors the reference's test strategy (SURVEY.md section 4.4): most
cases run FheMode DISABLE/SIMULATE (the integer pipeline without
crypto); one small EXECUTE case pins the encrypted path per family where
it is cheap enough for CI.
"""

import numpy as np
import pytest

from tfhe_tpu.ml import (
    DecisionTreeClassifier,
    DecisionTreeRegressor,
    FheMode,
    GammaRegressor,
    KNeighborsClassifier,
    LinearSVC,
    LinearSVR,
    NeuralNetClassifier,
    PoissonRegressor,
    RandomForestClassifier,
    SGDClassifier,
    TweedieRegressor,
    XGBClassifier,
    XGBRegressor,
    compile_torch_model,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(160, 5))
    y = (X[:, 0] + 2 * X[:, 1] > 0.2).astype(int)
    yr = 3 * X[:, 0] + X[:, 1]
    return X, y, yr


# -- torch compile pipeline ---------------------------------------------------


def test_compile_torch_mlp(data):
    import torch.nn as nn

    X, y, _ = data
    net = nn.Sequential(nn.Linear(5, 8), nn.ReLU(), nn.Linear(8, 2))
    qm = compile_torch_model(net, X.astype(np.float32), n_bits=8)
    import torch

    ref = net(torch.tensor(X, dtype=torch.float32)).detach().numpy()
    got = qm.forward(X, fhe="disable")
    # quantized pipeline approximates the float net
    assert np.abs(got - ref).mean() < 0.15 * (np.abs(ref).mean() + 1)
    sim = qm.forward(X, fhe="simulate")
    assert sim.shape == ref.shape


def test_compile_torch_conv():
    import torch.nn as nn

    rng = np.random.default_rng(1)
    X = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
    net = nn.Sequential(
        nn.Conv2d(1, 3, 3), nn.ReLU(), nn.AvgPool2d(2), nn.Flatten(),
        nn.Linear(3 * 3 * 3, 2),
    )
    qm = compile_torch_model(net, X, n_bits=8)
    import torch

    ref = net(torch.tensor(X)).detach().numpy()
    got = qm.forward(X, fhe="disable")
    assert got.shape == ref.shape
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95


def test_quantized_module_execute_small():
    """One real encrypted Gemm through the module pipeline."""
    import torch.nn as nn

    rng = np.random.default_rng(2)
    X = rng.normal(size=(3, 4)).astype(np.float32)
    net = nn.Sequential(nn.Linear(4, 3))
    qm = compile_torch_model(net, X, n_bits=6).compile(seed=0)
    clear = qm.forward(X, fhe="disable")
    enc = qm.forward(X, fhe="execute")
    assert np.abs(enc - clear).max() < 0.2 * (np.abs(clear).max() + 1)


# -- trees ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "cls,kw",
    [
        (DecisionTreeClassifier, dict(max_depth=4)),
        (RandomForestClassifier, dict(n_estimators=5, max_depth=3, random_state=0)),
        (XGBClassifier, dict(n_estimators=6, max_depth=2, random_state=0)),
    ],
)
def test_tree_classifiers_match_sklearn(data, cls, kw):
    X, y, _ = data
    m = cls(n_bits=10, **kw).fit(X, y)
    agree = (m.predict(X) == m.sk_model.predict(X)).mean()
    assert agree >= 0.97
    proba = m.predict_proba(X)
    assert proba.shape == (len(X), 2)
    assert np.all(proba >= -1e-9) and np.all(proba <= 1 + 1e-9)


def test_tree_regressors_match_sklearn(data):
    X, _, yr = data
    m = DecisionTreeRegressor(n_bits=10, max_depth=4).fit(X, yr)
    assert np.abs(m.predict(X) - m.sk_model.predict(X)).mean() < 0.05
    g = XGBRegressor(n_bits=10, n_estimators=8, max_depth=2, random_state=0).fit(X, yr)
    assert np.abs(g.predict(X) - g.sk_model.predict(X)).mean() < 0.05


def test_tree_multiclass(data):
    X, _, _ = data
    y3 = (X[:, 0] > 0).astype(int) + (X[:, 1] > 0.5).astype(int)
    m = XGBClassifier(n_bits=10, n_estimators=4, max_depth=2, random_state=0).fit(X, y3)
    assert (m.predict(X) == m.sk_model.predict(X)).mean() >= 0.97


# -- svm / glm / knn / sgd ------------------------------------------------------


def test_linear_svc(data):
    X, y, _ = data
    m = LinearSVC(n_bits=10, dual="auto").fit(X, y)
    # near-margin samples flip under 10-bit quantization; 0.94 matches
    # the reference's accuracy-tolerance testing style
    assert (m.predict(X) == m.sk_model.predict(X)).mean() >= 0.94


def test_linear_svr(data):
    X, _, yr = data
    m = LinearSVR(n_bits=10).fit(X, yr)
    ref = m.sk_model.predict(X)
    assert np.abs(m.predict(X) - ref).mean() < 0.1 * (np.abs(ref).mean() + 1)


def test_glms(data):
    X, _, yr = data
    ypos = np.exp(yr / (np.abs(yr).max() + 1)) + 0.1
    for cls, kw in [
        (PoissonRegressor, {}),
        (GammaRegressor, {}),
        (TweedieRegressor, dict(power=1.5)),
    ]:
        m = cls(n_bits=10, **kw).fit(X, ypos)
        ref = m.sk_model.predict(X)
        rel = np.abs(m.predict(X) - ref) / (np.abs(ref) + 1e-6)
        assert rel.mean() < 0.05, cls.__name__


def test_knn(data):
    X, y, _ = data
    m = KNeighborsClassifier(n_neighbors=3, n_bits=10).fit(X, y)
    from sklearn.neighbors import KNeighborsClassifier as SK

    ref = SK(n_neighbors=3).fit(X, y)
    assert (m.predict(X) == ref.predict(X)).mean() >= 0.95


def test_sgd_clear_and_simulated_training(data):
    X, y, _ = data
    m = SGDClassifier(n_bits=8, epochs=40).fit(X, y)
    assert (m.predict(X) == y).mean() > 0.9
    m2 = SGDClassifier(n_bits=8, epochs=40, fit_encrypted=True).fit(
        X, y, fhe="simulate"
    )
    assert (m2.predict(X) == y).mean() > 0.85


def test_qnn(data):
    X, y, _ = data
    m = NeuralNetClassifier(hidden=(16,), n_bits=8, epochs=60).fit(X, y)
    assert (m.predict(X) == y).mean() > 0.9
