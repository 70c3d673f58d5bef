"""Empirical noise validation at production parameters.

Measures decrypt-phase error distributions (mean, sigma) after each
pipeline stage -- fresh encryption, keyswitch, full PBS atom -- and
compares them against the analytic calculus in tfhe_tpu/noise.py.
Writes NOISE_PROFILE_<params-hash-prefix>.json (the reference ships
measured profiles keyed by params hash:
ml/extensions/src/concrete_ml_extensions/noise_profiles/MANIFEST.json,
utils_simulation.py:48-70). VERDICT r4 item 7.

Tolerances: the analytic numbers are upper bounds in places (the fused
CMux form doubles EP variance conservatively; digit variances assume
worst-case uniform), so the gate is
    measured_std <= predicted_std * TOL_HIGH   (model is a real bound)
    measured_std >= predicted_std / TOL_LOW    (model is not vacuous)

Usage: python scripts/bench_noise_empirical.py  (default backend = the
chip under the driver; the slow-tier test reuses run_noise_profile on
CPU at the same parameters).
"""

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TOL_HIGH = 1.6
TOL_LOW = 40.0


def run_noise_profile(params=None, n_samples: int = 512, progress=print):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import noise as tn
    from tfhe_tpu import params as tp
    from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe, keyswitch
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.torus import decode, encode
    from tfhe_tpu.utils import keycache

    P = params or tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    t0 = time.time()
    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
    progress(f"keygen {time.time() - t0:.0f}s (warm={kinfo['hit']})")

    space = P.message_modulus * P.carry_modulus
    msgs = np.arange(n_samples, dtype=np.uint64) % P.message_modulus
    enc_vals = np.asarray(encode(jnp.asarray(msgs), P.delta))

    def err_stats(phases, expected):
        e = (np.asarray(phases, dtype=np.uint64)
             - np.asarray(expected, dtype=np.uint64)).astype(np.int64)
        return float(np.mean(e)), float(np.std(e))

    stages = {}

    # 1. fresh encryption under the big key
    ct = encrypt_lwe(
        ck.big_lwe_key, jnp.asarray(enc_vals), FheRng(3), P.glwe_noise
    )
    mean, std = err_stats(decrypt_lwe(ck.big_lwe_key, ct), enc_vals)
    stages["fresh_encrypt"] = {
        "measured_mean": mean,
        "measured_std": std,
        "predicted_std": math.sqrt(P.glwe_noise.variance_torus()),
    }

    # 2. keyswitch big -> small
    small = keyswitch(ct, sk.ksk)
    mean, std = err_stats(decrypt_lwe(ck.lwe_key, small), enc_vals)
    pred = math.sqrt(
        P.glwe_noise.variance_torus()
        + tn.keyswitch_variance(
            P.glwe_dimension * P.polynomial_size,
            P.ks,
            P.lwe_noise.variance_torus(),
        )
    )
    stages["keyswitch"] = {
        "measured_mean": mean, "measured_std": std, "predicted_std": pred,
    }

    # 3. full PBS atom (keyswitch + blind rotate + sample extract)
    table = np.asarray(
        [(3 * v + 1) % P.message_modulus for v in range(space)],
        dtype=np.uint64,
    )
    lut = si.generate_lut(P, table)
    out = si.apply_lut(
        sk,
        si.Ciphertext(ct=ct, params=P, degree=P.message_modulus - 1,
                      noise_level=1),
        lut,
        out_degree=P.message_modulus - 1,
    )
    dec = np.asarray(decode(decrypt_lwe(ck.big_lwe_key, out.ct), P.delta,
                            space))
    want = table[msgs.astype(int)]
    n_correct = int((dec % P.message_modulus == want).sum())
    expected_out = np.asarray(encode(jnp.asarray(want), P.delta))
    mean, std = err_stats(decrypt_lwe(ck.big_lwe_key, out.ct), expected_out)
    stages["pbs_atom"] = {
        "measured_mean": mean,
        "measured_std": std,
        "predicted_std": math.sqrt(tn.pbs_output_variance(P)),
        "decrypt_correct": n_correct,
        "decrypt_total": n_samples,
    }

    ok = True
    for name, s in stages.items():
        ratio = s["measured_std"] / max(s["predicted_std"], 1e-9)
        s["ratio_measured_over_predicted"] = round(ratio, 4)
        s["within_tolerance"] = bool(
            ratio <= TOL_HIGH and ratio >= 1.0 / TOL_LOW
        )
        ok = ok and s["within_tolerance"]
        progress(
            f"{name}: measured sigma 2^{math.log2(max(s['measured_std'], 1)):.1f} "
            f"predicted 2^{math.log2(max(s['predicted_std'], 1)):.1f} "
            f"ratio {ratio:.3f}"
        )
    ok = ok and n_correct == n_samples

    import jax as _jax

    return {
        "metric": "noise_model_validation",
        "value": 1.0 if ok else 0.0,
        "unit": "pass",
        "vs_baseline": 1.0,
        "detail": {
            "params": P.name,
            "params_hash": P.hash[:16],
            "backend": _jax.default_backend(),
            "n_samples": n_samples,
            "tol_high": TOL_HIGH,
            "tol_low": TOL_LOW,
            "stages": stages,
        },
    }


def main():
    from tfhe_tpu.utils.xlacache import enable_persistent_cache

    enable_persistent_cache()
    res = run_noise_profile()
    tag = res["detail"]["params_hash"][:8]
    art = os.path.join(REPO, f"NOISE_PROFILE_{tag}.json")
    with open(art, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    sys.exit(0 if res["value"] == 1.0 else 1)


if __name__ == "__main__":
    main()
