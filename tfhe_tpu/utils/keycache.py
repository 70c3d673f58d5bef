"""Warm-start key cache: serialized (ClientKey, ServerKey) on disk.

tfhe-rs keygen takes seconds and keys are routinely serialized and
reloaded (reference: the SDK fetches pre-generated server keys over
/keyurl, sdk/relayer/src/tfhe.ts:13-33; the coprocessor never
regenerates keys per process). Here cold keygen is one large jitted
device program (minutes at production multibit params, dominated by
compile + the GGSW fan-out), so a production server must pay it ONCE:
this module caches the key pair on disk keyed by (params hash, seed,
engine), and `load_or_keygen` turns every later process start into a
deserialize + host->device transfer.

The cache trusts its directory (keys include the SECRET key client
half); it is a single-host warm-start, not a distribution channel —
the serving layer's /keyurl path stays the way EVALUATION keys travel.

Backend policy: the disk path is only a win where host->device
bandwidth is cheap (CPU). On the tunneled TPU, seeded on-device
regeneration under the persistent XLA compile cache is faster than
shipping gigabytes through the tunnel, so load_or_keygen skips disk
there (measured round 4: 202 s load vs 67.6 s regen for classic keys).
"""

from __future__ import annotations

import os
import time
from typing import Any

# multibit GROUP_3 server keys are ~2.4 GB serialized — far over the
# protocol's 512 MiB wire cap, which exists for untrusted *network*
# payloads (utils/serialization.py), not for this trusted local cache.
KEY_CACHE_MAX = 8 * 1024 * 1024 * 1024

def _default_dir() -> str:
    """Repo-local `.cache/keys` when the package runs from a writable
    source checkout (so warm starts survive /tmp cleanup and machine
    moves), else /tmp. TFHE_TPU_KEY_CACHE_DIR overrides both."""
    env = os.environ.get("TFHE_TPU_KEY_CACHE_DIR")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(root, ".git")) and os.access(root, os.W_OK):
        return os.path.join(root, ".cache", "keys")
    return "/tmp/tfhe_tpu_keys"


DEFAULT_DIR = _default_dir()


def _effective_group(params, multibit_group: int | None) -> int:
    """Mirror si.keygen's inference: MULTI_BIT_GROUP_N param sets imply
    their group; the cache key must agree no matter how callers spell it."""
    if multibit_group is not None:
        return multibit_group
    name = getattr(params, "name", "")
    if "MULTI_BIT_GROUP_" in name:
        return int(name.split("MULTI_BIT_GROUP_")[1].split("_")[0])
    return 0


def cache_path(params, seed: int, multibit_group: int | None,
               cache_dir: str | None = None) -> str:
    d = cache_dir or DEFAULT_DIR
    g = _effective_group(params, multibit_group)
    # the NTT-domain key material depends on the engine's CRT prime set
    # (DEFAULT_PRIMES is a process-level constant): a 4-prime process
    # must never load 3-prime keys
    from tfhe_tpu.ops.folded_ntt import DEFAULT_PRIMES

    ptag = f"_p{len(DEFAULT_PRIMES)}" if len(DEFAULT_PRIMES) != 3 else ""
    return os.path.join(
        d, f"{params.hash[:16]}_s{seed}_g{g}{ptag}.tfhekeys"
    )


def save_keys(path: str, ck, sk) -> None:
    from tfhe_tpu.utils.serialization import serialize

    # owner-only: the blob contains the SECRET client key, and the
    # default dir lives under /tmp on shared hosts
    os.makedirs(os.path.dirname(path), mode=0o700, exist_ok=True)
    try:
        os.chmod(os.path.dirname(path), 0o700)
    except OSError:
        pass
    blob = serialize((ck, sk), max_size=KEY_CACHE_MAX)
    tmp = path + f".tmp.{os.getpid()}"
    fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic: concurrent writers never tear


def load_keys(path: str):
    from tfhe_tpu.utils.serialization import deserialize

    with open(path, "rb") as f:
        return deserialize(f.read(), max_size=KEY_CACHE_MAX)


def _disk_cache_pays_off() -> bool:
    """On the tunneled TPU backend the disk cache LOSES: deserializing a
    key blob costs a host->device transfer at tunnel bandwidth (~3-7
    MB/s measured -- 202 s to load the 591 MB classic keys vs 67.6 s to
    regenerate them on-device from the seed, round 4). Keygen ships only
    the seed across the wire and runs at HBM speed, and the persistent
    XLA cache (utils/xlacache.py) already amortizes its compile. On CPU
    (serving hosts, tests) loading wins by minutes. TFHE_TPU_KEY_CACHE
    overrides: 0 = never touch disk, force = always use disk."""
    mode = os.environ.get("TFHE_TPU_KEY_CACHE", "1")
    if mode == "force":
        return True
    try:
        import jax

        return jax.default_backend() not in ("tpu",)
    except Exception:
        return True


def load_or_keygen(params, seed: int = 0, multibit_group: int | None = None,
                   cache_dir: str | None = None) -> tuple[Any, Any, dict]:
    """(ck, sk, info): cached keys when present, else keygen + store.

    info = {"hit": bool, "seconds": wall time of whichever path ran}.
    Disable with TFHE_TPU_KEY_CACHE=0 (info then reports hit=False and
    nothing is written). On TPU backends the disk path is skipped
    entirely (see _disk_cache_pays_off): seeded on-device keygen under
    the persistent XLA compile cache is the faster warm start there.
    """
    from tfhe_tpu.models import shortint as si

    enabled = (os.environ.get("TFHE_TPU_KEY_CACHE", "1") != "0"
               and _disk_cache_pays_off())
    path = cache_path(params, seed, multibit_group, cache_dir)
    if enabled and os.path.exists(path):
        t0 = time.time()
        try:
            ck, sk = load_keys(path)
        except Exception:
            # corrupt / truncated / older-format entry: regenerate and
            # overwrite rather than failing every process start forever
            pass
        else:
            return ck, sk, {"hit": True, "seconds": time.time() - t0,
                            "path": path}
    t0 = time.time()
    ck, sk = si.keygen(params, seed=seed, multibit_group=multibit_group)
    # force completion so the measured time covers the device work
    import jax

    jax.device_get(jax.tree_util.tree_leaves(sk)[0].ravel()[:1])
    dt = time.time() - t0
    if enabled:
        save_keys(path, ck, sk)
    return ck, sk, {"hit": False, "seconds": dt, "path": path}
