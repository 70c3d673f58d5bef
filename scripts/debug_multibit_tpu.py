"""Isolate the fused multi-bit kernel's TPU divergence: compare the
fused result against the XLA multi-bit path at full params, batch 8,
and print decoded phase errors."""

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
from tfhe_tpu.core.keys import (
    gen_glwe_secret_key,
    gen_lwe_secret_key,
    glwe_to_lwe_secret_key,
)
from tfhe_tpu.core.lwe import decrypt_lwe, encrypt_lwe
from tfhe_tpu.core.multibit import (
    gen_multibit_bootstrap_key,
    monomial_x_table,
    multibit_programmable_bootstrap,
)
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng
from tfhe_tpu.torus import decode

U64 = jnp.uint64
g = int(sys.argv[1]) if len(sys.argv) > 1 else 3
P = {
    2: tp.PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    3: tp.PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
}[g]

engine = si.engine_for(P)
rng = FheRng(1)
lwe_sk = gen_lwe_secret_key(rng, P.lwe_dimension)
glwe_sk = gen_glwe_secret_key(rng, P.glwe_dimension, P.polynomial_size)
big_sk = glwe_to_lwe_secret_key(glwe_sk)
print("keygen...", flush=True)
t0 = time.time()
bsk = gen_multibit_bootstrap_key(
    lwe_sk, glwe_sk, P.pbs, g, rng.fork(), P.glwe_noise, engine
)
jax.device_get(bsk.bsk_ntt.ravel()[:1])
print(f"keygen {time.time()-t0:.0f}s", flush=True)

vals = jnp.arange(16, dtype=U64) % U64(4)
from tfhe_tpu.torus import encode

ct = encrypt_lwe(lwe_sk, encode(vals, P.delta), FheRng(2), P.lwe_noise)
lut = si.generate_lut(P, np.arange(16, dtype=np.uint64))

out = multibit_programmable_bootstrap(ct, lut, bsk, engine)
raw = np.asarray(decrypt_lwe(big_sk, out)).astype(np.uint64)
want_pt = (np.arange(16) % 4).astype(np.uint64)
space = P.plaintext_modulus // 2
dec = np.asarray(decode(jnp.asarray(raw), P.delta, space))
# phase error relative to the intended encoding
err = (raw - want_pt * np.uint64(P.delta)).astype(np.int64)
print("decoded:", dec % 4, flush=True)
print("want   :", want_pt, flush=True)
print("log2|err|:", [int(np.log2(abs(e))) if e else 0 for e in err], flush=True)
