"""Device mesh construction for distributed FHE.

Axes:
  * "data"  -- independent ciphertexts (batch parallelism). The reference's
    analog is rayon loops over ciphertext lists and the redis worker pool
    (reference: ml/extensions/rust/src/compression.rs:276,
    local-dev/docker-compose.yml WORKER_COUNT=4); here it is a sharded
    leading axis.
  * "model" -- intra-PBS sharding: GGSW decomposition rows and keyswitch
    input dimension are split across devices and partial sums reduced with
    `psum` over ICI (SURVEY.md section 2: "decomposition-limb / GGSW-level
    sharding of a single PBS across chips (TP analog)").

On multi-host slices "data" should map to the DCN-facing axis (independent
work, no per-step traffic) and "model" to intra-host/ICI links.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        assert n_dev % n_model == 0
        n_data = n_dev // n_model
    assert n_data * n_model <= n_dev
    devs = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))
