"""Device mesh + expert-axis sharding.

The reference has no distributed backend (SURVEY.md §2.4); here the natural
data-parallel axis is the *experts* batch dimension: every expert is
independent, so a bucket batch [B, N, D] shards over a 1-d 'experts' mesh with
zero collectives in the fit/predict path. XLA partitions the vmapped programs
automatically when inputs carry a NamedSharding.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "shard_experts", "pad_to_multiple"]


def get_mesh(n_devices=None, devices=None, axis_name="experts"):
    """1-d mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def pad_to_multiple(n, m):
    """Smallest multiple of m >= n."""
    return int(-(-n // m) * m)


def shard_experts(tree, mesh, axis_name="experts"):
    """Place each leaf (leading dim = experts) sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def _put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(_put, tree)
