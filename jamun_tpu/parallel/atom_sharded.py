"""Atom-sharded message passing for very large single molecules.

The graph analog of sequence/context parallelism (SURVEY §5.7 — absent in the
reference, which fits each molecule on one GPU). For IDRome-scale point clouds
the dense [N, N] pair work is sharded over the mesh along the *destination*
axis: node features are all-gathered once per layer (the halo exchange), each
device computes messages into its local dst slice, outputs stay sharded.

Usage: wrap a conv-apply with `atom_sharded(mesh)(fn)` via shard_map, with
positions/features sharded on axis "data" along the atom dimension.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["atom_sharded_pair_op", "shard_atoms"]


def shard_atoms(arr: jnp.ndarray, mesh: Mesh, axis: int = 0):
    """Shard the atom axis of [N, ...] arrays over the mesh's data axis."""
    spec = [None] * arr.ndim
    spec[axis] = "data"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def atom_sharded_pair_op(mesh: Mesh, pair_fn: Callable, axis_name: str = "data"):
    """Build a shard_map'd dense pair operation for one large molecule.

    pair_fn(x_full [N, D], pos_full [N, 3], dst_slice [n_local]) -> [n_local, D_out]
    computes outputs for a contiguous dst slice given the *full* (gathered)
    node features/positions. The wrapper all-gathers x and pos (the halo —
    O(N*D) per layer over ICI) and returns dst-sharded outputs.
    """

    def sharded(x_local, pos_local):
        # all-gather the halo: full features/positions on every device
        x_full = jax.lax.all_gather(x_local, axis_name, axis=0, tiled=True)
        pos_full = jax.lax.all_gather(pos_local, axis_name, axis=0, tiled=True)
        idx = jax.lax.axis_index(axis_name)
        n_local = x_local.shape[0]
        dst_start = idx * n_local
        return pair_fn(x_full, pos_full, dst_start, n_local)

    return jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
