"""Examples stay runnable (subprocess, CPU, toy params)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    # keep the axon plugin out of the subprocess: with the TPU tunnel
    # down its registration hook blocks any backends() walk forever
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, script, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_biometric_example():
    r = _run("examples/biometric_auth.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "genuine probe accepted: True" in r.stdout


def test_glwe_dot_demo():
    r = _run("examples/glwe_dot_demo.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "profile bound" in r.stdout


def test_hybrid_serving_demo():
    r = _run("examples/hybrid_serving_demo.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_fhe_digits_demo():
    r = _run("examples/fhe_digits_demo.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all under FHE" in r.stdout
