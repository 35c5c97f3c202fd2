"""Flat-vector packing of named parameter dicts for batched optimisers."""

import numpy as np
import jax.numpy as jnp

__all__ = ["ParamSpec", "pack", "unpack"]


class ParamSpec:
    """Ordered (name, shape) list describing a flat parameter vector layout."""

    def __init__(self, entries):
        self.entries = [(name, tuple(shape)) for name, shape in entries]
        self.sizes = [int(np.prod(s)) if len(s) else 1 for _, s in self.entries]
        self.total = sum(self.sizes)
        self.offsets = np.cumsum([0] + self.sizes[:-1]).tolist()

    @property
    def names(self):
        return [n for n, _ in self.entries]

    def __repr__(self):
        return f"ParamSpec({self.entries})"


def pack(params, spec):
    """Dict of arrays -> flat vector in spec order (jnp)."""
    parts = []
    for (name, shape), size in zip(spec.entries, spec.sizes):
        v = jnp.asarray(params[name]).reshape(size)
        parts.append(v)
    return jnp.concatenate(parts) if parts else jnp.zeros(0)


def unpack(vec, spec):
    """Flat vector -> dict of arrays with spec shapes."""
    out = {}
    for (name, shape), size, off in zip(spec.entries, spec.sizes, spec.offsets):
        v = vec[off:off + size]
        out[name] = v.reshape(shape) if len(shape) else v[0]
    return out
