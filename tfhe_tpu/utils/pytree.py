"""Pytree-registered dataclasses with static (metadata) fields.

Key material and ciphertext wrappers carry both device arrays (pytree data)
and static configuration (parameter dataclasses, degrees). Registering the
split lets whole key/ciphertext objects cross jit/pjit boundaries, be donated
and sharded like any other pytree.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(*, meta: tuple = ()):
    """Decorator: frozen dataclass registered as a jax pytree, with the
    fields named in `meta` treated as static auxiliary data."""

    def wrap(cls):
        cls = dataclasses.dataclass(frozen=True)(cls)
        fields = [f.name for f in dataclasses.fields(cls)]
        data_fields = [f for f in fields if f not in meta]
        jax.tree_util.register_dataclass(
            cls, data_fields=data_fields, meta_fields=list(meta)
        )
        return cls

    return wrap
