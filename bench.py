"""Benchmark: programmable bootstraps/sec per chip (BASELINE.json north star).

Measures BOTH bootstrap engines at the MESSAGE_2_CARRY_2 TUNIFORM 2M128
parameter family and prints ONE JSON line whose headline value is the
fastest production engine:

- multi-bit PBS (PARAM_MULTI_BIT_GROUP_3_...): the tfhe-rs multi-bit
  bootstrap the reference's GPU coprocessor uses -- 3 secret bits per
  blind-rotation step (core/multibit.py); decrypt-verified.
- classic PBS (PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128): the
  n-step CMux chain; reported in detail.classic_pbs_per_s.

Both run keyswitch + blind rotate + sample extract, batched, on the
default JAX backend (the real TPU chip under the driver; CPU elsewhere).
If the multi-bit path fails for any reason the classic number is the
headline (fail-safe).

Baseline denominator: the reference's crypto engine is tfhe-rs consumed as
WASM (sdk/relayer pins tfhe@1.4.0-alpha.3); it cannot execute in this image
(no node runtime, no vendored .wasm). Published tfhe-rs figures for these
params are ~6-8 ms/PBS native single-thread and 3-5x slower under WASM;
we use 30 PBS/s as the single-thread WASM denominator (documented estimate,
see BASELINE.md "Action item").
"""

import json
import sys
import time

WASM_REFERENCE_PBS_PER_S = 30.0


def _probe_backend(timeout_s: int = 600) -> str | None:
    """Initialize the backend in a SUBPROCESS first: with the TPU tunnel
    down, make_c_api_client blocks forever (uninterruptible C call), and
    an in-process attempt would hang the whole bench. Returns the
    platform name, or None if init failed/timed out."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    return r.stdout.strip() if r.returncode == 0 else None


def _dry_run() -> None:
    """Pre-commit smoke (`python bench.py --dry-run`): build and execute
    BOTH bootstrap engines end-to-end at a tiny fused-kernel-capable
    parameter set on whatever backend is available (CPU interpret mode
    off-chip), decrypt-verify, and print one JSON line. Exercises engine
    construction, the fused Pallas kernels and the decode path, so a
    refactor that breaks the hot path can never be committed with a
    green smoke (VERDICT r4 weak #9). Forces the CPU backend so the
    smoke is tunnel-independent and fast (interpret-mode kernels)."""
    import dataclasses
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.core import bootstrap as bt
    from tfhe_tpu.core.lwe import (
        decrypt_lwe,
        encrypt_lwe,
        sample_extract,
    )
    from tfhe_tpu.core.keys import (
        gen_glwe_secret_key,
        gen_lwe_secret_key,
        glwe_to_lwe_secret_key,
    )
    from tfhe_tpu.core.multibit import (
        gen_multibit_bootstrap_key,
        multibit_blind_rotate,
    )
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import decode, encode

    P = dataclasses.replace(
        tp.TOY_SHORTINT_NOISELESS,
        name="BENCH_DRYRUN",
        pbs=tp.GadgetParams(base_log=23, level=1),
    )
    engine = si.engine_for(P)
    engine_use, engine.use_pallas = engine.use_pallas, True
    try:
        rng = FheRng(3)
        lwe_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
        glwe_sk = gen_glwe_secret_key(
            rng, P.glwe_dimension, P.polynomial_size
        )
        big_sk = glwe_to_lwe_secret_key(glwe_sk)
        table = np.asarray([(3 * v) % 4 for v in range(16)], dtype=np.uint64)
        lut = si.generate_lut(P, table)
        msgs = jnp.asarray(np.arange(6) % 4, dtype=jnp.uint64)
        ct = encrypt_lwe(lwe_sk, encode(msgs, P.delta), rng.fork(), P.lwe_noise)
        want = table[np.asarray(msgs)] % 4

        # classic fused path
        bsk = bt.gen_bootstrap_key(
            lwe_sk, glwe_sk, P.pbs, rng.fork(), P.glwe_noise, engine
        )
        out = bt.programmable_bootstrap(ct, lut, bsk, engine)
        dec = np.asarray(decode(decrypt_lwe(big_sk, out), P.delta, 16)) % 4
        assert (dec == want).all(), "dry-run: classic PBS output wrong"

        # multi-bit fused path
        mbk = gen_multibit_bootstrap_key(
            lwe_sk, glwe_sk, P.pbs, 2, rng.fork(), P.glwe_noise, engine
        )
        glwe = multibit_blind_rotate(lut, ct, mbk, engine)
        dec2 = np.asarray(
            decode(decrypt_lwe(big_sk, sample_extract(glwe, 0)), P.delta, 16)
        ) % 4
        assert (dec2 == want).all(), "dry-run: multibit PBS output wrong"
    finally:
        engine.use_pallas = engine_use

    print(json.dumps({
        "metric": "pbs_per_sec_per_chip",
        "value": 0.0,
        "unit": "PBS/s",
        "vs_baseline": 0.0,
        "detail": {"dry_run": True, "backend": jax.default_backend(),
                   "engines_verified": ["classic_fused", "multibit_fused"]},
    }))


def main():
    if "--dry-run" in sys.argv:
        _dry_run()
        return
    backend = _probe_backend()
    if backend is None:
        import os

        last = None
        art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_MULTIBIT.json")
        try:
            with open(art) as f:
                rec = json.load(f)
            last = {"value": rec.get("value"),
                    "unit": rec.get("unit"),
                    "artifact": "BENCH_MULTIBIT.json",
                    "note": "last committed on-chip measurement"}
        except Exception:
            pass
        print(json.dumps({
            "metric": "pbs_per_sec_per_chip",
            "value": 0.0,
            "unit": "PBS/s",
            "vs_baseline": 0.0,
            "detail": {"error": "backend init failed or timed out "
                                "(TPU tunnel unreachable); no fresh "
                                "measurement possible this run",
                       "last_measured": last},
        }))
        sys.exit(1)

    import jax

    # persistent compile cache: keygen/PBS programs are identical across
    # runs; caching cuts the multi-minute remote-tunnel compiles. The
    # cache is repo-local (.cache/xla) so it survives /tmp cleanup.
    from tfhe_tpu.utils.xlacache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.core.bootstrap import programmable_bootstrap
    from tfhe_tpu.core.lwe import keyswitch
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng

    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # Default: multi-bit only (the production engine). The classic CMux
    # chain doubles keygen+compile time (remote-tunnel compiles vary by
    # minutes run-to-run) -- measure it with TFHE_BENCH_CLASSIC=1; its
    # committed number lives in BENCH_CLASSIC.json.
    import os

    if not os.environ.get("TFHE_BENCH_CLASSIC"):
        mb = _bench_multibit(jax, jnp, np, si, batch, iters)
        print(
            json.dumps(
                {
                    "metric": "pbs_per_sec_per_chip",
                    "value": round(mb["pbs_per_s"], 2),
                    "unit": "PBS/s",
                    "vs_baseline": round(
                        mb["pbs_per_s"] / WASM_REFERENCE_PBS_PER_S, 2
                    ),
                    "detail": {
                        "params": mb["params"],
                        "batch": batch,
                        "iters": iters,
                        "engine": "multibit_group3",
                        "classic_pbs_per_s_artifact": 317.51,
                        **mb["detail"],
                        "backend": jax.devices()[0].platform,
                    },
                }
            )
        )
        return

    from tfhe_tpu.utils import keycache

    print("classic keygen...", file=sys.stderr, flush=True)
    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])  # force keygen completion
    keygen_s = kinfo["seconds"]
    print(
        f"classic keygen {keygen_s:.0f}s (warm={kinfo['hit']})",
        file=sys.stderr, flush=True,
    )

    engine = si.engine_for(P)
    rng = FheRng(2)
    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = si.encrypt(ck, vals, rng).ct
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    @jax.jit
    def step(cts, lut, bsk, ksk):
        # keys enter as arguments (device-resident), never as baked-in
        # constants -- constants would ride every compile payload
        return programmable_bootstrap(keyswitch(cts, ksk), lut, bsk, engine)

    def sync(x):
        # block_until_ready does NOT synchronize on the axon backend
        # (PERF_NOTES.md); a host read of one element forces completion.
        jax.device_get(x.ravel()[:1])

    t1 = time.time()
    out = step(ct, lut, sk.bsk, sk.ksk)
    sync(out)
    compile_s = time.time() - t1
    print(f"classic compile+step {compile_s:.0f}s", file=sys.stderr, flush=True)

    # correctness gate: the benchmark must compute real bootstraps
    dec = si.decrypt(ck, si.Ciphertext(ct=out, params=P, degree=3, noise_level=1))
    assert (np.asarray(dec) == np.asarray(vals)).all(), "PBS output wrong"

    t2 = time.time()
    for _ in range(iters):
        out = step(ct, lut, sk.bsk, sk.ksk)
    sync(out)
    dt = time.time() - t2

    pbs_per_s = batch * iters / dt

    detail = {
        "params": P.name,
        "batch": batch,
        "iters": iters,
        "ms_per_pbs": round(1000.0 * dt / (batch * iters), 3),
        "keygen_s": round(keygen_s, 1),
        "keygen_warm_start": kinfo["hit"],
        "compile_s": round(compile_s, 1),
        "backend": jax.devices()[0].platform,
    }

    # multi-bit engine (group 3): the production bootstrap (fastest);
    # classic stays the fallback headline if it fails for any reason
    headline = pbs_per_s
    try:
        print("multibit bench...", file=sys.stderr, flush=True)
        mb = _bench_multibit(jax, jnp, np, si, batch, iters)
        detail["classic_pbs_per_s"] = round(pbs_per_s, 2)
        detail["multibit"] = mb["detail"]
        detail["params"] = mb["params"]
        headline = mb["pbs_per_s"]
    except Exception as e:  # noqa: BLE001 -- fail-safe to classic
        detail["multibit_error"] = str(e)[:300]

    print(
        json.dumps(
            {
                "metric": "pbs_per_sec_per_chip",
                "value": round(headline, 2),
                "unit": "PBS/s",
                "vs_baseline": round(headline / WASM_REFERENCE_PBS_PER_S, 2),
                "detail": detail,
            }
        )
    )


def _bench_multibit(jax, jnp, np, si, batch, iters, group=3):
    """Multi-bit PBS timing (scripts/bench_multibit.py inline)."""
    import time

    from tfhe_tpu import params as tp
    from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe, keyswitch
    from tfhe_tpu.core.multibit import multibit_programmable_bootstrap
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import decode, encode

    P = tp.PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    engine = si.engine_for(P)
    # Warm-start: keys are serialized on first generation and reloaded on
    # every later process start (utils/keycache.py) -- a production
    # coprocessor pays the one jitted keygen program (477 s cold in round
    # 2, compile-dominated) exactly once per parameter set.
    from tfhe_tpu.utils import keycache

    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1, multibit_group=group)
    bsk, ksk = sk.bsk, sk.ksk
    big_sk = ck.big_lwe_key
    jax.device_get(bsk.bsk_ntt.ravel()[:1])
    keygen_s = kinfo["seconds"]

    vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
    ct = encrypt_lwe(big_sk, encode(vals, P.delta), FheRng(2), P.glwe_noise)
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))
    ks_jit = jax.jit(keyswitch)

    def step(cts):
        return multibit_programmable_bootstrap(ks_jit(cts, ksk), lut, bsk, engine)

    t1 = time.time()
    out = step(ct)
    jax.device_get(out.ravel()[:1])
    compile_s = time.time() - t1

    space = P.plaintext_modulus // 2
    dec = np.asarray(decode(decrypt_lwe(big_sk, out), P.delta, space)) % 4
    assert (dec == np.asarray(vals)).all(), "multibit PBS output wrong"

    t2 = time.time()
    for _ in range(iters):
        out = step(ct)
    jax.device_get(out.ravel()[:1])
    dt = time.time() - t2
    pbs_per_s = batch * iters / dt
    return {
        "pbs_per_s": pbs_per_s,
        "params": P.name,
        "detail": {
            "group_size": group,
            "ms_per_pbs": round(1000.0 * dt / (batch * iters), 3),
            "keygen_s": round(keygen_s, 1),
            "keygen_warm_start": kinfo["hit"],
            "compile_s": round(compile_s, 1),
        },
    }


if __name__ == "__main__":
    main()
