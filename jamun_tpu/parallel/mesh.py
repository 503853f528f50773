"""Device mesh + sharding helpers.

The reference's only on-device parallelism is NCCL data-parallel training and
embarrassingly-parallel sampling chains (SURVEY §2.10). TPU-native equivalent:
one logical "data" mesh axis spanning ICI (and DCN across hosts via
`jax.distributed`); batches/chains sharded on it, params replicated. Gradient
psum is inserted by the compiler under jit. An optional "model" axis is
reserved for atom-sharded large-molecule mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings", "pad_batch_to_multiple"]


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard the leading (graph/chain) axis of every array over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh, axis_name: str = "data"):
    """(replicated, batch-sharded) NamedShardings for jit in/out_shardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis_name))


def pad_batch_to_multiple(batch, multiple: int):
    """Pad the graph axis with masked dummy graphs to a device-count multiple."""
    import jax.numpy as jnp

    G = batch.num_graphs
    pad = (-G) % multiple
    if pad == 0:
        return batch

    def pad_arr(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != G:
            return x
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    return jax.tree.map(pad_arr, batch)
