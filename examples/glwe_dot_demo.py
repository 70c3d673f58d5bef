"""Encrypted-vector x clear-matrix demo (the reference's demo binary).

Reproduces ml/extensions/rust/src/main.rs:12-142: encrypt a vector,
multiply against a clear matrix server-side, compress the result,
decrypt -- the end-to-end loop of the encrypted-matmul engine.

Run:  python examples/glwe_dot_demo.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.models import glwe_matmul as gm


def main():
    params = gm.default_params()
    print(f"params: N={params.polynomial_size}, "
          f"{params.bits_reserved_for_computation} compute bits")
    pkey = gm.create_private_key(params, seed=0)

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(1, 512), dtype=np.uint64)  # one row
    w = rng.integers(-8, 8, size=(512, 16))

    enc = gm.encrypt_matrix(pkey, jnp.asarray(x))
    res = gm.matrix_multiplication(enc, jnp.asarray(w), pkey)
    out = np.asarray(gm.decrypt_matrix(res, pkey))[0]

    ref = (x.astype(np.int64) @ w)[0]
    print("decrypted dot products:", out[:6], "...")
    print("clear reference       :", ref[:6], "...")
    # the compressed storage modulus (2^26) rounds outputs by design; the
    # analytic profile bounds the residual (reference noise_profiles role)
    from tfhe_tpu.noise import find_noise_profile

    sigma = find_noise_profile(params, x.shape[1])
    bound = 6.0 * sigma
    err = np.abs(out - ref).max()
    assert err <= bound, f"noise {err} exceeds 6-sigma bound {bound:.1f}"
    print(f"max |error| {err} LSB within the 6-sigma profile bound "
          f"({bound:.1f} LSB, sigma={sigma:.1f})")


if __name__ == "__main__":
    main()
