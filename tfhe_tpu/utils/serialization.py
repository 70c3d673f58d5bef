"""Size-capped binary serialization for keys, ciphertexts and results.

The reference serializes every crypto object with bincode/safe_serialize
under 512 MiB caps (reference: ml/extensions/rust/src/lib_python.rs:51-168,
sdk/relayer/src/sdk/encrypt.ts:190-193, src/constants.ts:1-3). Here every
framework object is a pytree of jnp arrays + static metadata, so
serialization is: JSON header (treedef + meta + shapes/dtypes) followed by
raw little-endian array payloads. This doubles as the checkpoint/resume
story (SURVEY.md section 5): keys and ciphertexts round-trip to disk.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

MAX_SERIALIZED_SIZE = 512 * 1024 * 1024  # reference cap (constants.ts:1-3)

_MAGIC = b"TFHETPU1"


class SerializationError(ValueError):
    pass


def _meta_of(obj) -> dict:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        d = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if isinstance(v, (jax.Array, np.ndarray)):
                d[f.name] = {"__array__": True}
            elif dataclasses.is_dataclass(v) or isinstance(v, tuple):
                d[f.name] = _meta_of(v)
            else:
                d[f.name] = v
        return {"__dataclass__": type(obj).__module__ + ":" + type(obj).__qualname__, "fields": d}
    if isinstance(obj, tuple) and hasattr(type(obj), "_fields"):
        # NamedTuple (secret keys, core/keys.py): keep the class, or the
        # round-trip degrades it to a plain tuple and property accessors
        # (.key, .k) vanish
        return {
            "__namedtuple__": type(obj).__module__ + ":" + type(obj).__qualname__,
            "fields": {k: _meta_of(v) for k, v in zip(type(obj)._fields, obj)},
        }
    if isinstance(obj, tuple):
        return {"__tuple__": [_meta_of(x) for x in obj]}
    if isinstance(obj, dict):
        # sorted keys: jax.tree_util.tree_leaves flattens dicts in sorted
        # key order, and array payloads must line up with it. str keys
        # only: non-str keys would silently change type on round-trip
        # (and mixed-type keys make sorted() raise).
        if not all(isinstance(k, str) for k in obj):
            raise TypeError("serialize: dict keys must be str")
        return {
            "__dict__": {k: _meta_of(obj[k]) for k in sorted(obj)}
        }
    if isinstance(obj, (jax.Array, np.ndarray)):
        return {"__array__": True}
    return obj


def serialize(obj: Any, max_size: int = MAX_SERIALIZED_SIZE) -> bytes:
    """Serialize a framework pytree (key, ciphertext, result) to bytes."""
    leaves = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(obj)
        if isinstance(x, (jax.Array, np.ndarray))
    ]
    header = {
        "meta": _meta_of(obj),
        "arrays": [{"dtype": str(a.dtype), "shape": list(a.shape)} for a in leaves],
    }
    hb = json.dumps(header, separators=(",", ":")).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(len(hb).to_bytes(8, "little"))
    buf.write(hb)
    for a in leaves:
        buf.write(np.ascontiguousarray(a).tobytes())
    out = buf.getvalue()
    if len(out) > max_size:
        raise SerializationError(
            f"serialized size {len(out)} exceeds cap {max_size}"
        )
    return out


def _resolve(qualname: str):
    """Resolve a serialized class name. Restricted to this package: the
    deserializer instantiates cls(**kwargs), so an unrestricted import
    would let a crafted blob (network payloads, pre-planted cache files)
    construct arbitrary classes — e.g. subprocess.Popen — in-process."""
    import importlib

    mod, _, name = qualname.partition(":")
    if not (mod == "tfhe_tpu" or mod.startswith("tfhe_tpu.")):
        raise SerializationError(
            f"refusing to resolve class outside tfhe_tpu: {qualname!r}"
        )
    target = importlib.import_module(mod)
    for part in name.split("."):
        target = getattr(target, part)
    return target


def _rebuild(meta, arrays: list):
    if isinstance(meta, dict) and "__dataclass__" in meta:
        cls = _resolve(meta["__dataclass__"])
        kwargs = {k: _rebuild(v, arrays) for k, v in meta["fields"].items()}
        return cls(**kwargs)
    if isinstance(meta, dict) and "__namedtuple__" in meta:
        cls = _resolve(meta["__namedtuple__"])
        return cls(**{k: _rebuild(v, arrays) for k, v in meta["fields"].items()})
    if isinstance(meta, dict) and "__tuple__" in meta:
        return tuple(_rebuild(x, arrays) for x in meta["__tuple__"])
    if isinstance(meta, dict) and "__dict__" in meta:
        return {k: _rebuild(v, arrays) for k, v in meta["__dict__"].items()}
    if isinstance(meta, dict) and meta.get("__array__"):
        return arrays.pop(0)
    if isinstance(meta, list):  # JSON turned tuples into lists
        return tuple(meta)
    return meta


def deserialize(data: bytes, max_size: int = MAX_SERIALIZED_SIZE) -> Any:
    """safe_deserialize analog: size cap + format validation."""
    if len(data) > max_size:
        raise SerializationError(f"input size {len(data)} exceeds cap {max_size}")
    if data[:8] != _MAGIC:
        raise SerializationError("bad magic")
    hlen = int.from_bytes(data[8:16], "little")
    header = json.loads(data[16 : 16 + hlen])
    off = 16 + hlen
    arrays = []
    for spec in header["arrays"]:
        dt = np.dtype(spec["dtype"])
        count = int(np.prod(spec["shape"])) if spec["shape"] else 1
        nbytes = dt.itemsize * count
        if off + nbytes > len(data):
            raise SerializationError("truncated payload")
        arr = np.frombuffer(data[off : off + nbytes], dtype=dt).reshape(spec["shape"])
        arrays.append(jnp.asarray(arr))
        off += nbytes
    return _rebuild(header["meta"], arrays)
