"""Multi-host (DCN) execution: 2-process jax.distributed run.

Spawns the real 2-process dryrun (scripts/multihost_dryrun.py) so the
default gate exercises the host axis end-to-end: loopback coordinator,
(host=2, data=2, model=2) mesh over 8 global CPU devices, decrypt
verification of every process-local output shard, and the HLO audit
that NO per-step collective crosses a host boundary (the DCN scaling
argument; reference analog: the docker-compose worker fleet,
local-dev/docker-compose.yml).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_dryrun.py")


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh") / "MULTIHOST.json"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # workers must be plain CPU
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, SCRIPT, str(out)],
        env=env, capture_output=True, timeout=900, text=True,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    with open(out) as f:
        return json.load(f)


def test_two_process_run_ok(artifact):
    assert artifact["ok"] is True
    assert artifact["n_processes"] == 2
    assert artifact["mesh"] == "2x2x2"
    assert artifact["global_devices"] == 8


def test_all_shards_decrypt_verified(artifact):
    # 2 hosts x (16 * n_data=2) rows each
    assert artifact["decrypt_verified_rows"] == 64


def test_no_per_step_collective_crosses_dcn(artifact):
    assert artifact["dcn_bytes_per_step"] == 0
    crossing = [c for c in artifact["collectives"] if c["crosses_host"]]
    assert crossing == []
    # the model-axis psums ARE there (the intra-host reductions)
    assert any(c["op"] == "all-reduce" for c in artifact["collectives"])


def test_collective_stats_parses_bytes():
    """Unit: the HLO parser extracts payload bytes + host crossing."""
    import jax
    from jax.sharding import Mesh
    from tfhe_tpu.parallel.multihost import collective_stats

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2, 1),
                ("host", "data", "model"))
    hlo = (
        "  ar = u32[2,3,128] all-reduce(u32[2,3,128] x), "
        "replica_groups={{0,1}}, to_apply=add\n"
    )
    stats = collective_stats(hlo, mesh)
    assert len(stats) == 1
    assert stats[0]["op"] == "all-reduce"
    assert stats[0]["bytes"] == 2 * 3 * 128 * 4
    assert stats[0]["crosses_host"] is False
