"""ML model-zoo benchmark: accuracy + latency across the sklearn zoo
(the reference's benchmark harness trio: ml/concrete-ml/benchmarks/
{classification,regression,glm}.py measures exactly this — accuracy of
fhe=execute vs clear sklearn, per-sample latency — over synthetic and
sklearn datasets with py-progress-tracker; here one script, one JSON).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/bench_ml.py
Writes BENCH_ML.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dataset(kind: str, seed: int = 7, n: int = 240, d: int = 10):
    import numpy as np

    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, d))
    if kind == "clf":
        w = rng.normal(0, 1, (d,))
        y = ((X @ w + 0.3 * rng.normal(0, 1, n)) > 0).astype(int)
    elif kind == "multiclf":
        w = rng.normal(0, 1, (d, 3))
        y = (X @ w).argmax(axis=1)
    elif kind == "glm":
        w = rng.normal(0, 0.3, (d,))
        y = np.exp(X @ w) + 0.05 * rng.uniform(0, 1, n)  # positive rates
    else:
        w = rng.normal(0, 1, (d,))
        y = X @ w + 0.1 * rng.normal(0, 1, n)
    k = int(0.8 * n)
    return X[:k], y[:k], X[k:], y[k:]


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)

    import numpy as np

    from tfhe_tpu import params as tparams
    from tfhe_tpu.ml.sklearn import LinearRegression, LogisticRegression
    from tfhe_tpu.ml.tree import RandomForestClassifier, XGBClassifier
    from tfhe_tpu.ml.zoo import (
        KNeighborsClassifier,
        LinearSVC,
        PoissonRegressor,
        TweedieRegressor,
    )

    # production GLWE matmul params on an accelerator; TOY on CPU (the
    # N=2048 compile per model costs minutes of CPU, same math)
    on_cpu = jax.devices()[0].platform == "cpu"
    P = tparams.TOY_MATMUL if on_cpu else None

    results = {}

    def run(name, model, kind, fhe="execute", n_fhe=8):
        Xtr, ytr, Xte, yte = _dataset(kind)
        t0 = time.time()
        model.fit(Xtr, ytr)
        fit_s = time.time() - t0
        if hasattr(model, "compile"):
            model.compile(seed=1)
        clear = model.predict(Xte)
        t0 = time.time()
        enc = model.predict(Xte[:n_fhe], fhe=fhe)
        fhe_ms = (time.time() - t0) / n_fhe * 1000
        if kind in ("clf", "multiclf"):
            acc_clear = float((clear == yte).mean())
            match = float((enc == clear[:n_fhe]).mean())
            results[name] = {
                "accuracy_clear": round(acc_clear, 3),
                "fhe_vs_clear_match": round(match, 3),
                "fhe_ms_per_sample": round(fhe_ms, 1),
                "fit_s": round(fit_s, 2),
                "mode": fhe,
            }
        else:
            denom = float(np.abs(clear[:n_fhe]).max()) or 1.0
            rel = float(np.abs(enc - clear[:n_fhe]).max()) / denom
            results[name] = {
                "r2_proxy_rel_err": round(rel, 4),
                "fhe_ms_per_sample": round(fhe_ms, 1),
                "fit_s": round(fit_s, 2),
                "mode": fhe,
            }
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    run("LogisticRegression", LogisticRegression(n_bits=8, params=P), "clf")
    run("LinearRegression", LinearRegression(n_bits=8, params=P), "reg")
    run("LinearSVC", LinearSVC(n_bits=8, params=P), "clf")
    run("PoissonRegressor", PoissonRegressor(n_bits=8, params=P), "glm")
    run("TweedieRegressor", TweedieRegressor(n_bits=8, params=P), "glm")
    run("RandomForestClassifier",
        RandomForestClassifier(n_estimators=8, max_depth=4, n_bits=6,
                               params=P, random_state=0), "clf")
    run("XGBClassifier",
        XGBClassifier(n_estimators=8, max_depth=3, n_bits=6, params=P,
                      random_state=0), "clf")
    run("KNeighborsClassifier",
        KNeighborsClassifier(n_neighbors=3, params=P), "clf",
        fhe="simulate")

    # headline covers only models that actually EXECUTED under FHE
    worst = min(
        r.get("fhe_vs_clear_match", 1.0)
        for r in results.values()
        if r["mode"] == "execute"
    )
    rec = {
        "metric": "ml_zoo_fhe_vs_clear_worst_match",
        "value": worst,
        "unit": "fraction",
        "detail": {"models": results,
                   "backend": __import__("jax").devices()[0].platform},
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_ML.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
