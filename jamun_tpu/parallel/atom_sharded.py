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

__all__ = [
    "atom_sharded_pair_op",
    "shard_atoms",
    "atom_sharded_arch_apply",
    "prepare_atom_sharded_batch",
    "atom_sharded_forward",
    "pad_atoms_to_multiple",
    "AtomShardedArch",
    "denoiser_with_atom_sharding",
    "resolve_atom_sharded",
]


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


def atom_sharded_forward(
    arch, mesh: Mesh, params, sharded, c_noise, cutoff,
    axis_name: str = "data", training: bool = False,
):
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
        kw = {"training": True} if training else {}
        return arch_s.apply(params, b, c_noise, cutoff, **kw)

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=atom3,
        check_vma=False,
    )(params, sharded)


def pad_atoms_to_multiple(batch, multiple: int):
    """Pad the ATOM axis of every [G, N, ...] field with masked rows so N is a
    device-count multiple (shard_map needs even shards). Bond lists index the
    original rows, so they are unaffected; residue-level gather maps would
    need re-padding and are dropped (`prepare_atom_sharded_batch` drops them
    anyway — atom-sharded mode is for flat-atom archs like E3Conv)."""
    N = batch.pos.shape[1]
    pad = (-N) % multiple
    if pad == 0:
        return batch

    def pad_atom_axis(x):
        if not hasattr(x, "shape") or x.ndim < 2 or x.shape[1] != N:
            return x
        return jnp.concatenate(
            [jnp.asarray(x), jnp.zeros((x.shape[0], pad) + x.shape[2:], x.dtype)], axis=1
        )

    return batch.replace(
        pos=pad_atom_axis(batch.pos),
        node_mask=pad_atom_axis(batch.node_mask),
        atom_type_index=pad_atom_axis(batch.atom_type_index),
        atom_code_index=pad_atom_axis(batch.atom_code_index),
        residue_code_index=pad_atom_axis(batch.residue_code_index),
        residue_sequence_index=pad_atom_axis(batch.residue_sequence_index),
        residue_atom_index=None, residue_atom_mask=None, residue_ca_index=None,
        residue_mask=None, residue_codes=None,
    )


class AtomShardedArch:
    """Duck-types a flax arch for `Denoiser`: `.apply` routes through the
    shard_map'd atom-sharded forward (per-layer feature halos over ICI), so
    the WHOLE product stack — Denoiser preconditioning, the jitted train step
    (gradients flow through shard_map; all_gather transposes to
    reduce_scatter), the Langevin walk — runs unchanged on molecules whose
    [N, N] pair work exceeds one chip (SURVEY §5.7; reference-side role:
    Lightning device placement, `scripts/slurm/train.sh:31-37`).

    Batches must be prepared with `pad_atoms_to_multiple` +
    `prepare_atom_sharded_batch` (host-side, once per batch) before entering
    the jitted step. `init` runs on the RAW (unprepared) batch — parameter
    shapes do not depend on the batch layout."""

    def __init__(self, arch, mesh: Mesh, axis_name: str = "data"):
        self.arch = arch
        self.mesh = mesh
        self.axis_name = axis_name

    @property
    def neighbor_mode(self):
        # sparse-cap telemetry dispatch (Denoiser.sparse_neighbors_active)
        # follows the wrapped arch's neighbor settings
        return getattr(self.arch, "neighbor_mode", None)

    @property
    def neighbor_cap(self):
        return getattr(self.arch, "neighbor_cap", 32)

    # signature marker only: Denoiser inspects __call__ for the `training`
    # kernel-dispatch flag (models/denoiser.py) — apply() is the real entry
    def __call__(self, batch, c_noise, radial_cutoff, training: bool = False):
        raise NotImplementedError("use .apply(params, ...)")

    def init(self, key, batch, c_noise, cutoff):
        return self.arch.init(key, batch, c_noise, cutoff)

    def apply(self, params, batch, c_noise, cutoff, training: bool = False, mutable=None):
        out = atom_sharded_forward(
            self.arch, self.mesh, params, batch, c_noise, cutoff,
            self.axis_name, training=training,
        )
        if mutable:
            # telemetry sows are not threaded through the shard_map'd forward
            # (the intermediates collection would need its own out_specs);
            # honor the flax (out, vars) contract with an empty collection —
            # atom-sharded runs simply report no neighbor_overflow
            return out, {}
        return out


def denoiser_with_atom_sharding(denoiser, mesh: Mesh, axis_name: str = "data"):
    """A copy of `denoiser` whose arch forward is atom-sharded over `mesh`."""
    from jamun_tpu.models.denoiser import Denoiser

    return Denoiser(AtomShardedArch(denoiser.arch, mesh, axis_name), denoiser.config)


def resolve_atom_sharded(mode, n_atoms: int, threshold: int, n_devices: int) -> bool:
    """Resolve the `parallel.atom_sharded` config knob: False | True | "auto"
    (engage when the padded molecule size reaches `threshold` atoms — the
    point where a single chip's dense/sparse pair work is better split over
    the mesh than replicated per chain)."""
    if n_devices <= 1 or mode in (False, None, "false", "off"):
        return False
    if mode in (True, "true", "on"):
        return True
    if mode == "auto":
        return n_atoms >= threshold
    raise ValueError(f"parallel.atom_sharded={mode!r} (want true/false/auto)")
