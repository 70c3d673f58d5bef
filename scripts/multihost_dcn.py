"""2-process multihost dryrun, BOTH distribution configurations:

  batch  -- ("host", "data", "model") mesh, batch sharded over hosts:
            zero per-step DCN bytes by design (the throughput-scaling
            layout; scripts/multihost_dryrun.py's original config).
  model  -- ("data", "model") mesh with the MODEL axis spanning the two
            processes (parallel.multihost.make_cross_host_model_mesh):
            the per-step psum over "model" (keyswitch partial sums +
            GGSW residue reductions) crosses the host boundary on EVERY
            step -- real DCN traffic, HLO-audited nonzero, the
            TP-over-DCN case VERDICT r4 asked to measure (keys too big
            for one host shard across hosts).

Each config decrypt-verifies every output row and reports 2-process
throughput vs a 1-process baseline at the SAME global device count and
global batch. Writes MULTIHOST_r05.json at the repo root.

Reference analog: the docker worker fleet scales batch over hosts
(local-dev/docker-compose.yml WORKER_COUNT); it has no cross-host
model sharding at all -- that axis is new TPU-native capability.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LOCAL_DEVICES = 4
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(config: str, pid: int, addr: str, nprocs: int) -> None:
    sys.path.insert(0, REPO)
    import numpy as np
    import jax

    if nprocs > 1:
        from tfhe_tpu.parallel.multihost import initialize

        initialize(addr, nprocs, pid)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tfhe_tpu import params as tp
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.parallel.multihost import (
        collective_stats,
        global_put,
        make_cross_host_model_mesh,
        make_host_mesh,
        make_multihost_pbs_step,
        replicate_batch_global,
        replicate_global,
        shard_batch_global,
    )
    from tfhe_tpu.parallel.sharded import make_sharded_pbs_step
    from tfhe_tpu.rng import FheRng

    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
    PP = tp.TOY_SHORTINT
    ck, sk = si.keygen(PP, seed=3)  # deterministic: same keys everywhere
    engine = si.engine_for(PP)
    lut_np = np.asarray(si.generate_lut(PP, np.arange(16, dtype=np.uint64)))

    if config == "batch":
        mesh = make_host_mesh(n_model=2)
        n_host, n_data = mesh.devices.shape[0], mesh.devices.shape[1]
        g_bsk, g_ksk = replicate_global(mesh, (sk.bsk.bsk_ntt, sk.ksk.ksk))
        lut = replicate_global(mesh, lut_np)
        # large enough that the per-step dispatch floor does not dominate
        # the efficiency ratio on the CPU loopback backend
        per_host = 64 * n_data
        vals_global = np.arange(n_host * per_host, dtype=np.uint64) % 4
        lo = pid * per_host if nprocs > 1 else 0
        local = vals_global[lo: lo + per_host] if nprocs > 1 else vals_global
        local_ct = si.encrypt(ck, jnp.asarray(local), FheRng(100 + pid)).ct
        g_ct = shard_batch_global(mesh, np.asarray(local_ct))
        step = make_multihost_pbs_step(
            mesh, engine, PP.ks, PP.pbs, sk.bsk.shift
        )
        expect_dcn = False
    else:  # model-over-DCN
        mesh = make_cross_host_model_mesh()
        n_data = mesh.devices.shape[0]
        # every process encrypts the SAME global batch (deterministic
        # rng): each host's devices hold a model-shard of every row
        batch_global = 16 * n_data
        vals_global = np.arange(batch_global, dtype=np.uint64) % 4
        ct_full = np.asarray(
            si.encrypt(ck, jnp.asarray(vals_global), FheRng(200)).ct
        )
        g_ct = replicate_batch_global(mesh, ct_full)
        g_bsk = global_put(
            mesh, P(None, "model", None, None, None),
            np.asarray(sk.bsk.bsk_ntt),
        )
        g_ksk = global_put(mesh, P("model", None, None), np.asarray(sk.ksk.ksk))
        lut = global_put(mesh, P(None, None), lut_np)
        step = make_sharded_pbs_step(
            mesh, engine, PP.ks, PP.pbs, bsk_shift=sk.bsk.shift
        )
        expect_dcn = nprocs > 1

    lowered = step.lower(g_ct, lut, g_bsk, g_ksk)
    compiled = lowered.compile()

    colls, dcn_bytes = [], 0
    if pid == 0:
        colls = collective_stats(compiled.as_text(), mesh)
        dcn_bytes = sum(c["bytes"] for c in colls if c["crosses_host"])
        if expect_dcn:
            assert dcn_bytes > 0, "model config must put bytes on DCN"
        else:
            assert dcn_bytes == 0, f"batch config leaked DCN bytes: {colls}"

    out = compiled(g_ct, lut, g_bsk, g_ksk)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(STEPS):
        out = compiled(g_ct, lut, g_bsk, g_ksk)
    jax.block_until_ready(out)
    wall = time.time() - t0

    # decrypt-verify every row this process can address (dedup slices)
    n_checked = 0
    seen = set()
    for sh in out.addressable_shards:
        sl = sh.index[0]
        key = (sl.start, sl.stop)
        if key in seen:
            continue
        seen.add(key)
        dec = si.decrypt(
            ck,
            si.Ciphertext(ct=jnp.asarray(np.asarray(sh.data)), params=PP,
                          degree=3, noise_level=1),
        )
        want = vals_global[sl]
        assert (np.asarray(dec) == want).all(), (pid, sl, np.asarray(dec))
        n_checked += len(want)

    res = {
        "proc": pid,
        "config": config,
        "nprocs": nprocs,
        "ok": True,
        "global_devices": len(jax.devices()),
        "mesh": "x".join(str(d) for d in mesh.devices.shape),
        "rows_verified": n_checked,
        "batch_global": int(len(vals_global)),
        "steps": STEPS,
        "wall_s": round(wall, 3),
        "pbs_per_s": round(len(vals_global) * STEPS / wall, 2),
    }
    if pid == 0:
        res["collectives"] = colls
        res["dcn_bytes_per_step"] = dcn_bytes
    with open(os.environ["TFHE_MH_OUT"], "w") as f:
        json.dump(res, f)


def _spawn(config: str, pid: int, addr: str, nprocs: int, out_path: str,
           n_local: int = N_LOCAL_DEVICES):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
        TFHE_MH_OUT=out_path,
        JAX_ENABLE_X64="1",
    )
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", config,
         str(pid), addr, str(nprocs)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _run_config(config: str, tmp: str):
    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        _spawn(config, i, addr, 2, f"{tmp}_{config}_p{i}.json")
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            out = (p.communicate()[0] or b"") + b"\n[timeout]"
        logs.append(out.decode(errors="replace")[-2000:])
    multi = []
    for i, p in enumerate(procs):
        if p.returncode != 0:
            return {"ok": False, "stage": f"{config}-worker{i}",
                    "log": logs[i]}
        with open(f"{tmp}_{config}_p{i}.json") as f:
            multi.append(json.load(f))

    bp = _spawn(config, 0, "none", 1, f"{tmp}_{config}_base.json",
                n_local=2 * N_LOCAL_DEVICES)
    bout, _ = bp.communicate(timeout=600)
    if bp.returncode != 0:
        return {"ok": False, "stage": f"{config}-baseline",
                "log": bout.decode(errors="replace")[-2000:]}
    with open(f"{tmp}_{config}_base.json") as f:
        base = json.load(f)

    eff = (multi[0]["pbs_per_s"] / base["pbs_per_s"]
           if base["pbs_per_s"] else 0)
    return {
        "ok": all(m["ok"] for m in multi),
        "config": config,
        "mesh": multi[0]["mesh"],
        "global_devices": multi[0]["global_devices"],
        "decrypt_verified_rows": sum(m["rows_verified"] for m in multi),
        "batch_global": multi[0]["batch_global"],
        "dcn_bytes_per_step": multi[0].get("dcn_bytes_per_step"),
        "collectives": multi[0].get("collectives"),
        "two_proc_pbs_per_s": multi[0]["pbs_per_s"],
        "one_proc_pbs_per_s": base["pbs_per_s"],
        "dcn_efficiency": round(eff, 3),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
        return
    artifact = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "MULTIHOST_r05.json"
    )
    tmp = f"/tmp/tfhe_mh5_{os.getpid()}"
    results = {c: _run_config(c, tmp) for c in ("batch", "model")}
    ok = all(r.get("ok") for r in results.values())
    final = {
        "ok": ok,
        "skipped": False,
        "n_processes": 2,
        "configs": results,
        "note": (
            "2 jax processes x 4 CPU devices over a loopback "
            "jax.distributed coordinator. 'batch' shards the ciphertext "
            "batch over the host axis (zero per-step DCN bytes, the "
            "throughput layout); 'model' spans the model axis across "
            "processes so keyswitch/GGSW psums cross hosts every step "
            "(nonzero DCN bytes, HLO-audited) -- the layout for keys too "
            "big for one host. CPU loopback timing is noisy; the byte "
            "audit is the load-bearing evidence."
        ),
    }
    with open(artifact, "w") as f:
        json.dump(final, f, indent=1)
    brief = {
        k: {kk: vv for kk, vv in v.items() if kk != "collectives"}
        if isinstance(v, dict) else v
        for k, v in results.items()
    }
    print(json.dumps({"ok": ok, "configs": brief}, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
