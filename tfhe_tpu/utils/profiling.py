"""Tracing / profiling helpers.

The reference has only ad-hoc wall-clock timers (reference:
tests/fhevm-suite/e2e_old/test/benchmarks/utils.ts Timing/displayTimings;
SURVEY.md section 5 "Tracing / profiling"). Here: a structured Timings
registry with per-section wall clock + derived rates, speed-of-light
accounting for the PBS pipeline, and a hook into the JAX profiler for
device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Timings:
    """Named wall-clock sections with call counts (device-synchronized if
    a `sync` callable is given, e.g. jax.block_until_ready on an output)."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync() if callable(sync) else sync)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self.total[name], 4),
                "count": self.count[name],
                "mean_ms": round(1000 * self.total[name] / self.count[name], 3),
            }
            for name in self.total
        }

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX/XLA device profile viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def pbs_speed_of_light(params, n_primes: int = 3, n_limbs: int = 1) -> dict:
    """Roofline estimate for one PBS at `params` on one chip.

    Counts the NTT butterfly multiplies and pointwise MACs, and the HBM
    bytes for streaming the bootstrap key once (the key is read in full per
    blind rotation; activations are tiny by comparison).
    """
    n = params.polynomial_size
    k1 = params.glwe_dimension + 1
    d = k1 * params.pbs.level
    steps = params.lwe_dimension
    log2n = n.bit_length() - 1
    # per step: D forward NTTs, k1*n_limbs inverse NTTs (per prime),
    # D*k1*n_limbs pointwise MACs (per prime)
    ntts = steps * (d + k1 * n_limbs) * n_primes
    butterflies = ntts * (n // 2) * log2n
    macs = steps * d * k1 * n_limbs * n_primes * n
    key_bytes = steps * d * k1 * n_primes * n_limbs * n * 4  # u32 residues
    return {
        "ntts": ntts,
        "butterfly_mults": butterflies,
        "pointwise_macs": macs,
        "bsk_bytes_per_pbs": key_bytes,
        "hbm_bound_pbs_per_s_at_800GBps": round(800e9 / key_bytes, 1),
    }
