"""Device-mesh and sharding helpers.

The reference distributes with PyTorch DDP over NCCL (train.py:33-53).
The TPU-native equivalent is a single jitted train step over a
``jax.sharding.Mesh``: the batch is sharded along a ``data`` axis (DP over
ICI), parameters are replicated, and gradient reduction happens implicitly
inside sharded autodiff — no process-group plumbing.

A second mesh axis (``model``) is available for sharding the splat's query
voxels / Gaussians when a config outgrows one chip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    mesh_devices = np.asarray(
        devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Shard every array's leading (batch) axis along the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_global_batch(mesh: Mesh, batch):
    """Assemble the GLOBAL data-sharded batch from this process's
    host-local batch.

    Single-process (one host driving the whole mesh): a plain device_put
    to the data-sharded layout. Multi-process (one host per device
    group, the reference's DDP per-rank batches, train.py:185-232): each
    process contributes its local arrays as its shard of the global
    batch via ``host_local_array_to_global_array`` — a direct
    ``device_put`` of host-local data to a global sharding is invalid
    there.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, P("data"))
