"""Empirical noise distributions vs the analytic model (noise.py).

Default tier: the runner at TOY-with-noise params (fast; checks the
measurement machinery and that the analytic model bounds reality at
small params). Slow tier (RUN_SLOW=1): full production parameters --
the configuration the chip artifact NOISE_PROFILE_*.json records
(reference ships measured profiles keyed by params hash:
noise_profiles/MANIFEST.json)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_noise_empirical import run_noise_profile  # noqa: E402

from tfhe_tpu import params as tp  # noqa: E402


def test_noise_model_toy_params():
    res = run_noise_profile(params=tp.TOY_SHORTINT, n_samples=256,
                            progress=lambda *_: None)
    stages = res["detail"]["stages"]
    assert stages["pbs_atom"]["decrypt_correct"] == 256
    for name, s in stages.items():
        assert s["within_tolerance"], (name, s)


@pytest.mark.slow
def test_noise_model_production_params():
    res = run_noise_profile(n_samples=256, progress=lambda *_: None)
    assert res["value"] == 1.0, res["detail"]["stages"]
