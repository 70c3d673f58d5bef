"""Fused Pallas NTT kernels vs the XLA folded engine (bit-for-bit).

On CPU the kernels run in Pallas interpret mode; the real-TPU path is
exercised by bench.py / scripts.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops.folded_ntt import get_folded_engine
from tfhe_tpu.ops.pallas_ntt import make_pallas_ntt


@pytest.mark.parametrize("nb", [3, 4])
@pytest.mark.parametrize("n", [64, 2048])
def test_forward_matches_engine(n, nb):
    eng = get_folded_engine(n)
    fwd, _ = make_pallas_ntt(eng, tm=8, nb=nb)
    rng = np.random.default_rng(0)
    x = rng.integers(-(2**22), 2**22, size=(5, n))
    got = np.asarray(fwd(jnp.asarray(x, dtype=jnp.int32)))
    want = np.asarray(eng.forward_small(jnp.asarray(x)))
    # both lazy in [0, 2p): compare canonical residues
    for i, ntt in enumerate(eng.ntts):
        np.testing.assert_array_equal(
            got[:, i, :] % ntt.p, want[:, i, :] % ntt.p
        )


@pytest.mark.parametrize("n", [64, 2048])
def test_inverse_matches_engine(n):
    eng = get_folded_engine(n)
    fwd, inv = make_pallas_ntt(eng, tm=8)
    rng = np.random.default_rng(1)
    x = rng.integers(-(2**20), 2**20, size=(3, n))
    f = fwd(jnp.asarray(x, dtype=jnp.int32))
    back = np.asarray(inv(f))
    for i, ntt in enumerate(eng.ntts):
        np.testing.assert_array_equal(
            back[:, i, :], np.asarray(x) % ntt.p
        )


def test_full_polymul_through_kernels():
    """fwd -> pointwise_shoup -> inv residues -> Garner == engine.polymul."""
    n = 256
    eng = get_folded_engine(n)
    fwd, inv = make_pallas_ntt(eng, tm=8)
    rng = np.random.default_rng(2)
    a = rng.integers(-(2**9), 2**9, size=(2, n))
    b = rng.integers(0, 2**64, size=(2, n), dtype=np.uint64)
    key = eng.make_shoup(eng.forward_u64(jnp.asarray(b)))
    fa = fwd(jnp.asarray(a, dtype=jnp.int32))
    prod = eng.pointwise_shoup(fa, key)
    res = inv(prod)
    out = np.asarray(
        eng.crt_reconstruct([res[..., i, :] for i in range(3)])
    )
    want = np.asarray(eng.polymul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(out, want)


def test_padding_of_partial_tiles():
    n = 64
    eng = get_folded_engine(n)
    fwd, inv = make_pallas_ntt(eng, tm=8)
    x = np.arange(3 * n).reshape(3, n) % 1000  # 3 rows: not a tile multiple
    got = np.asarray(fwd(jnp.asarray(x, dtype=jnp.int32)))
    want = np.asarray(eng.forward_small(jnp.asarray(x)))
    for i, ntt in enumerate(eng.ntts):
        np.testing.assert_array_equal(
            got[:, i, :] % ntt.p, want[:, i, :] % ntt.p
        )
