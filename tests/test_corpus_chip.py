"""Sampled operator corpus at production parameters (slow tier).

Default tier: the case table runs at TOY params (fast semantics gate
for the shared runner in scripts/bench_corpus_chip.py). Slow tier
(TFHE_RUN_SLOW=1): the full production-parameter sweep the chip
artifact BENCH_CORPUS_CHIP.json records -- hours on CPU, minutes on
the chip (reference: fhevmOperations1-13.ts runs at real coprocessor
params)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_corpus_chip import run_corpus  # noqa: E402

from tfhe_tpu import params as tp  # noqa: E402


def test_corpus_runner_toy():
    """The shared runner passes every element assertion at TOY params
    (same code path the chip artifact uses)."""
    res = run_corpus(params=tp.TOY_SHORTINT_CORPUS, nvec=4,
                     progress=lambda *_: None)
    assert res["detail"]["failed"] == 0, res["detail"]["per_op"]
    assert res["detail"]["element_assertions"] >= 100


@pytest.mark.skipif(
    not os.environ.get("TFHE_RUN_SLOW"),
    reason="production-params corpus: hours on CPU (chip artifact: "
    "BENCH_CORPUS_CHIP.json)",
)
def test_corpus_production_params():
    res = run_corpus(nvec=4, progress=lambda *_: None)
    assert res["detail"]["failed"] == 0, res["detail"]["per_op"]
