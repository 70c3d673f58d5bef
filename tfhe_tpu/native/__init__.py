"""Native host-runtime layer (C, loaded via ctypes).

The reference keeps its host-native work in Rust (keccak handle hashing,
bincode, bit-packed modulus-switched storage -- compression.rs:59-128
PackedIntegers); this package compiles the equivalent C kernels on first
use (cc is in the base image; pybind11 is not, hence ctypes). Falls back
to pure python transparently if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "native.c")

_lib = None
_tried = False


def _build() -> str | None:
    so_path = os.path.join(_HERE, "_tfhe_native.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cc = os.environ.get("CC", "cc")
    # per-pid temp name (no mktemp TOCTOU): concurrent builders each
    # compile their own file; os.replace makes the install atomic
    fd, tmp = tempfile.mkstemp(
        suffix=f".{os.getpid()}.so", prefix="_tfhe_native_", dir=_HERE
    )
    os.close(fd)
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.tfhe_keccak256.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ]
        lib.tfhe_bitpack.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
            ctypes.c_int, ctypes.c_char_p,
        ]
        lib.tfhe_bitpack.restype = ctypes.c_size_t
        lib.tfhe_bitunpack.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes:
    """Ethereum keccak-256. Native C when available, else the pure-python
    implementation in utils/keccak.py."""
    lib = _load()
    if lib is None:
        from tfhe_tpu.utils.keccak import keccak256_py

        return keccak256_py(data)
    out = ctypes.create_string_buffer(32)
    lib.tfhe_keccak256(data, len(data), out)
    return out.raw


def bitpack(vals: np.ndarray, bits: int) -> bytes:
    """Dense LSB-first packing of u32 values at `bits` bits each (the
    reference's PackedIntegers storage codec, compression.rs:59-128)."""
    assert 1 <= bits <= 32
    v = np.ascontiguousarray(vals.reshape(-1), dtype=np.uint32)
    n = v.size
    nbytes = (n * bits + 7) // 8
    lib = _load()
    if lib is None:
        # pure-python fallback via big integers
        acc = 0
        for i in range(n - 1, -1, -1):
            acc = (acc << bits) | int(v[i] & ((1 << bits) - 1))
        return acc.to_bytes(nbytes, "little") if nbytes else b""
    out = ctypes.create_string_buffer(nbytes + 8)  # slack for 8-byte stores
    lib.tfhe_bitpack(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n, bits, out
    )
    return out.raw[:nbytes]


def bitunpack(data: bytes, bits: int, count: int) -> np.ndarray:
    assert 1 <= bits <= 32
    lib = _load()
    if lib is None:
        acc = int.from_bytes(data, "little")
        mask = (1 << bits) - 1
        return np.array(
            [(acc >> (bits * i)) & mask for i in range(count)], dtype=np.uint32
        )
    out = np.empty(count, dtype=np.uint32)
    buf = data + b"\x00" * 8  # slack for 8-byte loads at the tail
    lib.tfhe_bitunpack(
        buf, count, bits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    )
    return out


# -- secp256k1 scalar multiplication ------------------------------------------


def _setup_ec(lib):
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.tfhe_ec_mul.argtypes = [u64p, u64p, u64p]
    lib.tfhe_ec_mul2.argtypes = [u64p, u64p, u64p, u64p, u64p]
    lib.tfhe_ec_affine.argtypes = [u64p, u64p]
    lib.tfhe_ec_affine.restype = ctypes.c_int
    lib.__ec_ready = True


def _limbs(v: int):
    return (ctypes.c_uint64 * 4)(*[(v >> (64 * i)) & ((1 << 64) - 1)
                                   for i in range(4)])


def _pt_limbs(pt):
    x, y, z = pt
    arr = (ctypes.c_uint64 * 12)()
    for j, v in enumerate((x, y, z)):
        for i in range(4):
            arr[j * 4 + i] = (v >> (64 * i)) & ((1 << 64) - 1)
    return arr


def _pt_from(arr):
    vals = [sum(int(arr[j * 4 + i]) << (64 * i) for i in range(4))
            for j in range(3)]
    return tuple(vals)


def ec_available() -> bool:
    lib = _load()
    if lib is None or not hasattr(lib, "tfhe_ec_mul"):
        return False
    if not getattr(lib, "__ec_ready", False):
        _setup_ec(lib)
    return True


def ec_mul(pt, k: int):
    """k * P over secp256k1, Jacobian (x, y, z) int tuples."""
    lib = _load()
    out = (ctypes.c_uint64 * 12)()
    lib.tfhe_ec_mul(_pt_limbs(pt), _limbs(k), out)
    return _pt_from(out)


def ec_mul2(a, ka: int, b, kb: int):
    """ka * A + kb * B (shared-doubling ladder)."""
    lib = _load()
    out = (ctypes.c_uint64 * 12)()
    lib.tfhe_ec_mul2(_pt_limbs(a), _limbs(ka), _pt_limbs(b), _limbs(kb), out)
    return _pt_from(out)


def ec_affine(pt):
    """Jacobian -> affine (x, y); raises at infinity."""
    lib = _load()
    out = (ctypes.c_uint64 * 8)()
    if not lib.tfhe_ec_affine(_pt_limbs(pt), out):
        raise ValueError("point at infinity")
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    return x, y
