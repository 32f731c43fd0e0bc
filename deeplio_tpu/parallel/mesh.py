"""Device mesh construction and sharding rules.

The reference is single-process/single-GPU (SURVEY.md §2.7) — its only
parallelism is DataLoader workers. The rebuild's distribution story is
TPU-native: a ``jax.sharding.Mesh`` with a ``data`` axis for batch
(data-parallel over ICI, gradients reduced with psum inside shard_map) and
a ``model`` axis kept in the mesh for forward-compatible tensor sharding
(size 1 by default — TP is deliberately not exercised for this model scale,
see SURVEY.md §2.7 and the design note in docs/).

All code paths run under shard_map even on one device (mesh of size 1), so
collectives (BatchNorm cross-replica stats, grad psum) are always legal.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    if data == -1:
        if len(devs) % model:
            raise ValueError(f"{len(devs)} devices not divisible by model={model}")
        data = len(devs) // model
    n = data * model
    if n > len(devs):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
