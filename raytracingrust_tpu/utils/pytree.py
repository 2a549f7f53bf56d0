"""Tiny helper to declare frozen dataclasses as JAX pytrees.

Fields annotated via ``static=True`` metadata become aux data (hashed into the
jit cache key — compile-time constants); everything else is traced leaves.
"""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    kwargs.setdefault("metadata", {})
    kwargs["metadata"] = dict(kwargs["metadata"], static=True)
    return dataclasses.field(**kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        (meta_fields if f.metadata.get("static") else data_fields).append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
