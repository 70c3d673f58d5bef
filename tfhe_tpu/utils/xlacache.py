"""Persistent XLA compilation cache (repo-local by default).

Remote-tunnel TPU compiles of the PBS/keygen programs take minutes
(PERF_NOTES.md); they are identical across processes for a given
parameter set, so a persistent cache turns every process after the
first into a cache load. tfhe-rs' analog is that its kernels are
AOT-compiled into the shipped library — here XLA compiles at runtime,
so the cache IS the framework's ahead-of-time story.

The cache lives next to the key cache under `<repo>/.cache/xla` when
running from a source checkout (survives /tmp cleanup between
sessions); TFHE_TPU_XLA_CACHE_DIR overrides. XLA keys entries by
platform/topology + program fingerprint, so TPU and CPU entries
coexist; note the XLA:CPU backend additionally keys by host CPU flags
(an AOT executable from a different machine fails to load — the reason
tests/conftest.py disables the cache for the CPU suite).
"""

from __future__ import annotations

import os


def cache_dir() -> str:
    env = os.environ.get("TFHE_TPU_XLA_CACHE_DIR")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(root, ".git")) and os.access(root, os.W_OK):
        return os.path.join(root, ".cache", "xla")
    return "/tmp/tfhe_tpu_jax_cache"


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX at the persistent compile cache; returns the dir used.

    Call BEFORE the first jit compilation (ideally right after importing
    jax). Safe to call more than once.
    """
    import jax

    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return d
