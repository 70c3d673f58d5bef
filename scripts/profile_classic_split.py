"""Classic-PBS attribution on the real chip: keyswitch vs blind-rotate
vs sample-extract split, plus batch scaling (round-4 hunt for the last
+11% to 300 PBS/s on PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128).

Usage: python scripts/profile_classic_split.py [batch ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tfhe_tpu.utils.xlacache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from tfhe_tpu import params as tp
from tfhe_tpu.core.bootstrap import blind_rotate, programmable_bootstrap
from tfhe_tpu.core.lwe import keyswitch, sample_extract
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.utils import keycache


def sync(x):
    jax.device_get(x.ravel()[:1])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)  # compile + first run
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    batches = [int(b) for b in sys.argv[1:]] or [512, 1024]
    P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    t0 = time.time()
    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
    print(json.dumps({"keygen_s": round(time.time() - t0, 1),
                      "warm": kinfo["hit"]}), flush=True)
    engine = si.engine_for(P)
    lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

    ks_j = jax.jit(keyswitch)
    br_j = jax.jit(lambda c, l, b: blind_rotate(l, c, b, engine))
    full_j = jax.jit(
        lambda c, l, b, k: programmable_bootstrap(keyswitch(c, k), l, b, engine)
    )

    for batch in batches:
        vals = jnp.arange(batch, dtype=jnp.uint64) % jnp.uint64(4)
        ct = si.encrypt(ck, vals, FheRng(2)).ct
        t_ks = timeit(ks_j, ct, sk.ksk)
        small = ks_j(ct, sk.ksk)
        t_br = timeit(br_j, small, lut, sk.bsk)
        t_full = timeit(full_j, ct, lut, sk.bsk, sk.ksk)
        dec = si.decrypt(ck, si.Ciphertext(
            ct=full_j(ct, lut, sk.bsk, sk.ksk), params=P, degree=3,
            noise_level=1))
        ok = bool((np.asarray(dec) == np.asarray(vals)).all())
        print(json.dumps({
            "batch": batch,
            "keyswitch_ms": round(t_ks * 1e3, 1),
            "blind_rotate_ms": round(t_br * 1e3, 1),
            "full_pbs_ms": round(t_full * 1e3, 1),
            "pbs_per_s": round(batch / t_full, 2),
            "ks_frac": round(t_ks / t_full, 3),
            "decrypt_ok": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
