"""Batched-PBS dispatcher: the coprocessor work-queue, TPU style.

The reference's coprocessor distributes FHE ops through a redis queue over a
worker pool (reference: local-dev/docker-compose.yml fhe-worker,
WORKER_COUNT=4; SURVEY.md section 3.4 "batched-PBS dispatcher"). On TPU the
economics invert: one device prefers few LARGE programs. The dispatcher
therefore collects pending PBS requests, groups them by compatible program
signature (LUT table, operand shape), pads each group to a bucket size so
XLA reuses compiled programs, runs one batched PBS per group, and scatters
results back to the callers' handles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

U64 = jnp.uint64


@dataclasses.dataclass
class _Pending:
    key: tuple  # program signature: (lut_bytes_hash, ct_dim)
    ct: jax.Array  # (n+1,) one LWE ciphertext
    ticket: int


class PbsDispatcher:
    """Collect single-ciphertext PBS requests, execute them as padded
    batched programs.

    run_batch: callable (cts (B, n+1), lut_table np.ndarray) -> (B, m+1)
    bucket_sizes: allowed padded batch sizes (ascending). Padding wastes at
    most the distance to the next bucket while keeping the number of
    distinct compiled programs tiny.
    """

    def __init__(
        self,
        run_batch: Callable,
        bucket_sizes: tuple = (1, 8, 64, 256, 1024),
    ):
        self._run = run_batch
        self._buckets = tuple(sorted(bucket_sizes))
        self._queue: list[_Pending] = []
        self._results: dict[int, jax.Array] = {}
        self._next_ticket = 0
        self.stats = {"submitted": 0, "executed": 0, "padded": 0, "batches": 0}

    def submit(self, ct: jax.Array, lut_table: np.ndarray) -> int:
        """Enqueue one PBS(ct, lut). Returns a ticket for result pickup."""
        t = self._next_ticket
        self._next_ticket += 1
        key = (lut_table.tobytes(), ct.shape[-1])
        self._queue.append(_Pending(key=key, ct=ct, ticket=t))
        self.stats["submitted"] += 1
        return t

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return -(-n // self._buckets[-1]) * self._buckets[-1]

    def flush(self):
        """Group by signature, pad, execute, store results."""
        groups: dict[tuple, list[_Pending]] = {}
        for p in self._queue:
            groups.setdefault(p.key, []).append(p)
        self._queue.clear()
        for key, items in groups.items():
            lut_table = np.frombuffer(key[0], dtype=np.uint64)
            n = len(items)
            b = self._bucket(n)
            cts = jnp.stack([p.ct for p in items], axis=0)
            if b > n:
                pad = jnp.zeros((b - n,) + cts.shape[1:], dtype=cts.dtype)
                cts = jnp.concatenate([cts, pad], axis=0)
                self.stats["padded"] += b - n
            out = self._run(cts, lut_table)
            for i, p in enumerate(items):
                self._results[p.ticket] = out[i]
            self.stats["executed"] += n
            self.stats["batches"] += 1

    def result(self, ticket: int) -> jax.Array:
        if ticket not in self._results:
            self.flush()
        return self._results.pop(ticket)
