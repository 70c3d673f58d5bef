"""BASELINE config 5: pod-scale batched-PBS shape validation.

Compiles AND executes the distributed PBS step over a ("data", "model")
mesh with a 10k+ ciphertext batch (8 virtual CPU devices stand in for
the pod slice -- the same program lowers onto real ICI meshes), at TOY
parameters so execution is tractable on CPU. Reports the per-device
shard shapes and the collective operations XLA inserted (the measured
virtual-mesh collective counts SCALING.md cites). Writes
BENCH_POD_DRYRUN.json.
"""

import json
import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from tfhe_tpu import params as tp
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.parallel import make_mesh, make_sharded_pbs_step
    from tfhe_tpu.rng import FheRng

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    P = tp.TOY_SHORTINT
    n_data, n_model = 4, 2
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    ck, sk = si.keygen(P, seed=3)
    engine = si.engine_for(P)
    step = make_sharded_pbs_step(mesh, engine, P.ks, P.pbs, bsk_shift=sk.bsk.shift)

    rng = FheRng(4)
    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = si.encrypt(ck, vals, rng)
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    lowered = step.lower(ct.ct, lut, sk.bsk.bsk_ntt, sk.ksk.ksk)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    collectives = {
        name: len(re.findall(rf"\b{name}\b", hlo))
        for name in ("all-reduce", "reduce-scatter", "all-gather",
                     "collective-permute", "all-to-all")
    }

    t0 = time.time()
    out = step(ct.ct, lut, sk.bsk.bsk_ntt, sk.ksk.ksk)
    out.block_until_ready()
    dt = time.time() - t0
    dec = si.decrypt(ck, si.Ciphertext(ct=out, params=P, degree=3, noise_level=1))
    ok = bool((np.asarray(dec) == np.asarray(vals)).all())

    result = {
        "metric": "pod_scale_pbs_dryrun",
        "value": batch,
        "unit": "concurrent PBS (virtual 8-device mesh)",
        "detail": {
            "params": P.name,
            "mesh": {"data": n_data, "model": n_model},
            "batch_per_data_shard": batch // n_data,
            "decrypt_verified": ok,
            "first_exec_s": round(dt, 1),
            "collectives_in_hlo": collectives,
            "note": (
                "TOY params on 8 virtual CPU devices: validates the 10k+ "
                "batch SHAPE (sharding + collectives + numerics); chip "
                "throughput is bench.py's metric"
            ),
        },
    }
    assert ok, "sharded PBS decrypt mismatch"
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_POD_DRYRUN.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
