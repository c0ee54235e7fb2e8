"""Device-mesh helpers: the framework's entire communication layer.

The reference's distributed surface is NCCL process groups + a spawn pool
pinning sequences to GPUs (SURVEY.md section 2.6). TPU-native, both collapse
into data placement on a jax.sharding.Mesh: XLA emits the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Create a mesh; default = all devices on one 'data' axis.

    axis_sizes e.g. {"data": 4, "model": 2}; -1 means 'remaining devices'.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": n}
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    mesh_devices = mesh_utils.create_device_mesh(tuple(sizes), devices=devices)
    return Mesh(mesh_devices, names)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dimension across `axis`."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def process_local_slice(n_items: int) -> slice:
    """Which slice of a global work list this host owns (replaces
    DistributedSampler host sharding, base_functions.py:147)."""
    per = -(-n_items // jax.process_count())
    start = jax.process_index() * per
    return slice(start, min(start + per, n_items))
