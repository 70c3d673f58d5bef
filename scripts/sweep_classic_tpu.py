"""Classic-PBS kernel config sweep on the real chip (VERDICT round-2
item 2: get PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 >= 300 PBS/s).

Runs one subprocess per (tm, steps) config -- the tile/step knobs are
read from TFHE_TPU_TM / TFHE_TPU_STEPS at trace time, so each config
needs a fresh process. Prints one JSON line per config and a final
summary; pass configs as args like `32:4 64:4 128:4 32:8`.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(tm: int, steps: int, batch: int, iters: int) -> dict:
    code = f"""
import json, time
import sys
sys.path.insert(0, {REPO!r})
import jax
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
from tfhe_tpu.utils import keycache
ck, sk, kinfo = keycache.load_or_keygen(P, seed=1)
jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
keygen_s = kinfo["seconds"]
engine = si.engine_for(P)
vals = jnp.arange({batch}, dtype=jnp.uint64) % jnp.uint64(4)
ct = si.encrypt(ck, vals, FheRng(2)).ct
lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

@jax.jit
def step(cts, lut, bsk, ksk):
    return programmable_bootstrap(keyswitch(cts, ksk), lut, bsk, engine)

def sync(x):
    jax.device_get(x.ravel()[:1])

t1 = time.time()
out = step(ct, lut, sk.bsk, sk.ksk)
sync(out)
compile_s = time.time() - t1
dec = si.decrypt(ck, si.Ciphertext(ct=out, params=P, degree=3, noise_level=1))
assert (np.asarray(dec) == np.asarray(vals)).all(), "PBS output wrong"
t2 = time.time()
for _ in range({iters}):
    out = step(ct, lut, sk.bsk, sk.ksk)
sync(out)
dt = time.time() - t2
print(json.dumps(dict(pbs_per_s=round({batch}*{iters}/dt, 2),
                      keygen_s=round(keygen_s,1), compile_s=round(compile_s,1))))
"""
    env = dict(os.environ)
    env["TFHE_TPU_TM"] = str(tm)
    env["TFHE_TPU_STEPS"] = str(steps)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=3000,
    )
    if r.returncode != 0:
        return {"tm": tm, "steps": steps, "error": r.stderr[-500:]}
    out = json.loads(r.stdout.strip().splitlines()[-1])
    out.update(tm=tm, steps=steps, wall_s=round(time.time() - t0, 1))
    return out


def main():
    configs = [c for c in sys.argv[1:] if ":" in c] or [
        "32:4", "64:4", "128:4", "32:8", "64:8"
    ]
    batch, iters = 512, 3
    results = []
    for c in configs:
        tm, steps = (int(v) for v in c.split(":"))
        res = run_one(tm, steps, batch, iters)
        print(json.dumps(res), flush=True)
        results.append(res)
    best = max(
        (r for r in results if "pbs_per_s" in r),
        key=lambda r: r["pbs_per_s"],
        default=None,
    )
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
