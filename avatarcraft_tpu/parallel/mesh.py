"""Device mesh / sharding helpers.

The reference has no distributed layer at all (single GPU, single process —
SURVEY.md §2.5). The TPU-native parallelism model here:

* **ray-batch data parallelism**: the ray axis of every render/train batch is
  sharded across the mesh's ``data`` axis; field parameters are replicated
  (they are tiny: ~12 MB hash table + KBs of MLP). Gradient all-reduce is the
  psum XLA inserts automatically under jit-with-shardings.
* collectives ride ICI within a slice; nothing here ever touches host
  networking (the NCCL-equivalent layer is jit + NamedSharding).

All helpers degrade gracefully to a 1-device mesh on a single chip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading axis across the mesh; other axes replicated."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of [B, ...] arrays sharded on the batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
