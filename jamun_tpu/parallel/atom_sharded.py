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

__all__ = ["atom_sharded_pair_op", "shard_atoms", "atom_sharded_arch_apply", "prepare_atom_sharded_batch", "atom_sharded_forward"]


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


def partition_bonds_by_dst(bond_src, bond_dst, bond_mask, n_dev: int, n_loc: int):
    """Host-side: repartition per-graph bond lists so each device owns the
    bonds whose DST atom lives on it (dst re-indexed to local rows; src stays
    global — it indexes the gathered halo). Returns [G, n_dev * B_loc] arrays
    laid out device-major, ready to shard along axis 1."""
    import numpy as np

    bond_src = np.asarray(bond_src)
    bond_dst = np.asarray(bond_dst)
    bond_mask = np.asarray(bond_mask).astype(bool)
    G = bond_src.shape[0]
    per_dev = [[[] for _ in range(n_dev)] for _ in range(G)]
    for g in range(G):
        for b in range(bond_src.shape[1]):
            if not bond_mask[g, b]:
                continue
            d = int(bond_dst[g, b]) // n_loc
            per_dev[g][d].append((int(bond_src[g, b]), int(bond_dst[g, b]) - d * n_loc))
    B_loc = max(1, max(len(per_dev[g][d]) for g in range(G) for d in range(n_dev)))
    src = np.zeros((G, n_dev * B_loc), np.int32)
    dst = np.zeros((G, n_dev * B_loc), np.int32)
    msk = np.zeros((G, n_dev * B_loc), bool)
    for g in range(G):
        for d in range(n_dev):
            for i, (s, t) in enumerate(per_dev[g][d]):
                src[g, d * B_loc + i] = s
                dst[g, d * B_loc + i] = t
                msk[g, d * B_loc + i] = True
    return src, dst, msk


def atom_sharded_arch_apply(arch, mesh: Mesh, params, batch, c_noise, cutoff, axis_name: str = "data"):
    """Run an E3Conv-style arch forward with ATOMS sharded over the mesh.

    The molecule's atom axis is split across devices; each conv layer
    all-gathers node features (the halo — O(N*D) over ICI) and computes
    messages into its local dst rows. Output matches the dense single-device
    forward exactly (tests/test_parallel.py). Covers molecules whose [N, N]
    pair work exceeds one chip (IDRome-scale, SURVEY 5.7)."""
    sharded = prepare_atom_sharded_batch(batch, mesh)
    return atom_sharded_forward(arch, mesh, params, sharded, c_noise, cutoff, axis_name)


def prepare_atom_sharded_batch(batch, mesh: Mesh):
    """Host-side batch prep for the atom-sharded forward: repartition bonds by
    dst owner and drop residue-level fields. NOT jittable (Python bond loop);
    run once per batch, then `atom_sharded_forward` is fully jittable."""
    import numpy as np

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    N = batch.pos.shape[1]
    if N % n_dev:
        raise ValueError(f"pad atoms to a multiple of {n_dev} first (N={N})")
    n_loc = N // n_dev
    bsrc, bdst, bmask = partition_bonds_by_dst(
        batch.bond_src, batch.bond_dst, batch.bond_mask, n_dev, n_loc
    )
    return batch.replace(
        bond_src=jnp.asarray(bsrc), bond_dst=jnp.asarray(bdst), bond_mask=jnp.asarray(bmask),
        residue_atom_index=None, residue_atom_mask=None, residue_ca_index=None,
        residue_mask=None, residue_codes=None,
    )


def atom_sharded_forward(arch, mesh: Mesh, params, sharded, c_noise, cutoff, axis_name: str = "data"):
    """The jittable part of `atom_sharded_arch_apply` (takes a batch already
    prepared by `prepare_atom_sharded_batch`)."""
    arch_s = arch.clone(atom_axis=axis_name, use_pallas=False)

    atom2 = P(None, axis_name)
    atom3 = P(None, axis_name, None)
    batch_specs = sharded.replace(
        pos=atom3, node_mask=atom2, atom_type_index=atom2, atom_code_index=atom2,
        residue_code_index=atom2, residue_sequence_index=atom2,
        bond_src=atom2, bond_dst=atom2, bond_mask=atom2,
        loss_weight=P(None), graph_mask=P(None),
    )

    def fwd(params, b):
        return arch_s.apply(params, b, c_noise, cutoff)

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=atom3,
        check_vma=False,
    )(params, sharded)
