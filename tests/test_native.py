"""Native C runtime layer: keccak vectors, bitpack codec, packed
compressed-ciphertext wire format."""

import numpy as np
import pytest

from tfhe_tpu import native
from tfhe_tpu.utils.keccak import keccak256, keccak256_py


def test_keccak_vectors():
    # Ethereum keccak-256 known answers
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_native_matches_python_on_long_inputs():
    for n in (0, 1, 135, 136, 137, 300, 1000):
        data = bytes((7 * i + 3) % 256 for i in range(n))
        assert keccak256(data) == keccak256_py(data)


@pytest.mark.parametrize("bits", [1, 4, 7, 13, 21, 27, 31, 32])
def test_bitpack_roundtrip(bits):
    rng = np.random.default_rng(bits)
    v = rng.integers(0, 2**bits, size=777, dtype=np.uint64).astype(np.uint32)
    packed = native.bitpack(v, bits)
    assert len(packed) == (777 * bits + 7) // 8  # dense: no slack bytes
    np.testing.assert_array_equal(native.bitunpack(packed, bits, 777), v)


def test_packed_compressed_glwe_roundtrip():
    import jax.numpy as jnp

    from tfhe_tpu.core.seeded import (
        CompressedGlweCiphertext,
        pack_compressed_glwe,
        unpack_compressed_glwe,
    )

    rng = np.random.default_rng(0)
    data = rng.integers(0, 2**26, size=(2, 3, 64), dtype=np.uint64).astype(
        np.uint32
    )
    c = CompressedGlweCiphertext(data=jnp.asarray(data), log2_modulus=26)
    blob = pack_compressed_glwe(c)
    # dense: 26/32 of the naive u32 size (+ tiny header)
    assert len(blob) < data.size * 4 * 0.85
    back = unpack_compressed_glwe(blob)
    assert back.log2_modulus == 26
    np.testing.assert_array_equal(np.asarray(back.data), data)
