"""Small pytree-dataclass helper used by every stateful component.

All framework state (replay buffers, train states, reward-module carries) is
expressed as frozen dataclasses registered as JAX pytrees, so that any state
can cross a jit boundary, be donated, or be sharded with `jax.sharding`.
Static (non-array) configuration lives in fields marked with
``static_field()`` and becomes part of the treedef (hashable, triggers
recompilation when changed).
"""

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static metadata (not a traced leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree node.

    Fields created with ``static_field()`` are registered as metadata;
    everything else is a child (traced) leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        def replace(self, **updates):
            return dataclasses.replace(self, **updates)

        c.replace = replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)
