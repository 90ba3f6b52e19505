"""Static metadata nodes for device-array pytrees.

Index structures travel across jit boundaries as dicts of flat arrays plus
one ``meta`` entry: a hashable, jit-static record of geometry (bit widths,
k, level sizes, ...). Registered via ``jax.tree_util.register_static`` so
jit treats it as part of the treedef, not a traced leaf.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Meta:
    kv: tuple

    def __getattr__(self, name):
        for k, v in object.__getattribute__(self, "kv"):
            if k == name:
                return v
        raise AttributeError(name)

    def replace(self, **kwargs) -> "Meta":
        d = dict(self.kv)
        d.update(kwargs)
        return Meta(tuple(sorted(d.items())))


def meta(**kwargs) -> Meta:
    """Build a static Meta node; values must be hashable (ints, strs, tuples,
    or nested Meta)."""
    return Meta(tuple(sorted(kwargs.items())))


try:
    import jax

    jax.tree_util.register_static(Meta)
except Exception:  # pragma: no cover
    pass


def device_put(tree):
    """jax.device_put for an index pytree (Meta nodes ride in the treedef)."""
    import jax

    return jax.device_put(tree)


def tree_bytes(tree) -> int:
    """Total bytes of all array leaves in a device pytree (the actual HBM
    footprint of a chosen layout, as opposed to host-side num_bits())."""
    import jax

    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "nbytes")
    )
