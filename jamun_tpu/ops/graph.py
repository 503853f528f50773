"""Device-side batch and edge containers.

TPU-first batching: instead of PyG's ragged `Batch` + `radius_graph` +
`torch_scatter` (reference `/root/reference/src/jamun/model/denoiser.py:138-166`),
graphs are padded to [G, N_max] dense arrays. Radial adjacency is a masked
N x N distance test recomputed inside jit each step (static shapes, no sorts,
no scatters); bonded edges are a small static padded edge list.

Deliberate deviation from the reference: torch_cluster's `radius_graph`
silently caps in-degree at 32 neighbors (its default `max_num_neighbors`); the
dense formulation has no such cap.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp

__all__ = ["GraphBatch", "EdgeData", "dense_edge_data"]


@flax.struct.dataclass
class GraphBatch:
    """A batch of G graphs padded to N nodes and B bonded (directed) edges.

    Mirrors `DataWithResidueInformation`
    (`/root/reference/src/jamun/utils/data_with_residue_info.py:5`) in padded
    dense form. All index arrays are int32; masks are bool.
    """

    pos: jnp.ndarray  # [G, N, 3] float
    node_mask: jnp.ndarray  # [G, N]
    atom_type_index: jnp.ndarray  # [G, N]
    atom_code_index: jnp.ndarray  # [G, N]
    residue_code_index: jnp.ndarray  # [G, N]
    residue_sequence_index: jnp.ndarray  # [G, N]
    bond_src: jnp.ndarray  # [G, B] (directed; both directions present)
    bond_dst: jnp.ndarray  # [G, B]
    bond_mask: jnp.ndarray  # [G, B]
    loss_weight: jnp.ndarray  # [G]
    graph_mask: jnp.ndarray  # [G]
    # Optional residue-level layout (for hierarchical models like Ophiuchus,
    # reference `model/arch/ophiuchus.py:42-86`): atoms grouped by residue with
    # a static [G, R, P] gather map (P = max atoms per residue).
    residue_atom_index: Optional[jnp.ndarray] = None  # [G, R, P] -> index into N (0 if padded)
    residue_atom_mask: Optional[jnp.ndarray] = None  # [G, R, P]
    residue_ca_index: Optional[jnp.ndarray] = None  # [G, R] -> index of CA atom
    residue_mask: Optional[jnp.ndarray] = None  # [G, R]
    residue_codes: Optional[jnp.ndarray] = None  # [G, R]

    @property
    def num_graphs(self) -> int:
        return self.pos.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.pos.shape[1]

    @property
    def num_nodes_per_graph(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask, axis=-1)

    def replace_pos(self, pos: jnp.ndarray) -> "GraphBatch":
        return self.replace(pos=pos)


@flax.struct.dataclass
class EdgeData:
    """Edge features shared by all conv layers of one forward pass.

    The dense fields may be None when the fused Pallas conv path is active
    (it recomputes edge features in VMEM from the raw fields below)."""

    sh_dense: Optional[jnp.ndarray]  # [G, N, N, sh_dim] (dst, src)
    attr_dense: Optional[jnp.ndarray]  # [G, N, N, A]
    adj: Optional[jnp.ndarray]  # [G, N, N] float; adj[g, i, j] = 1 if edge src j -> dst i
    sh_bond: jnp.ndarray  # [G, B, sh_dim]
    attr_bond: jnp.ndarray  # [G, B, A]
    bond_src: jnp.ndarray  # [G, B]
    bond_dst: jnp.ndarray  # [G, B]
    bond_mask: jnp.ndarray  # [G, B] float
    # raw inputs for the fused Pallas path
    pos: Optional[jnp.ndarray] = None  # [G, N, 3]
    node_mask: Optional[jnp.ndarray] = None  # [G, N]
    radial_cutoff: Optional[jnp.ndarray] = None  # scalar
    bond0_embed: Optional[jnp.ndarray] = None  # [A // 2] bondedness-0 row
    bond1_embed: Optional[jnp.ndarray] = None  # [A // 2] bondedness-1 row
    # precomputed lane-packed edge features (ops/pallas/packed_conv.py):
    # identical for every conv layer of one forward, computed once by E3Conv
    ef_packed: Optional[jnp.ndarray] = None  # [G, EFR, N*N]
    bf_packed: Optional[jnp.ndarray] = None  # [G, EFR, B]
    ebsT_packed: Optional[jnp.ndarray] = None  # [G, N, B]
    ebd_packed: Optional[jnp.ndarray] = None  # [G, B, N]
    posm_packed: Optional[jnp.ndarray] = None  # [G, 8, N] position/mask rows
    # (gen-4 kernel: dense-pair geometry is rebuilt in-kernel from these)
    # sparse capped neighbor lists (ops/neighbors.py) — the large-N execution
    # path: when nbr_idx is set, Conv aggregates over the K kept neighbors
    # instead of the dense [N, N] panel (dense fields above stay None)
    nbr_idx: Optional[jnp.ndarray] = None  # [G, N, K] -> index into src atoms
    nbr_mask: Optional[jnp.ndarray] = None  # [G, N, K] float
    sh_nbr: Optional[jnp.ndarray] = None  # [G, N, K, sh_dim]
    attr_nbr: Optional[jnp.ndarray] = None  # [G, N, K, A]


def dense_edge_data(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    bond_src: jnp.ndarray,
    bond_dst: jnp.ndarray,
    bond_mask: jnp.ndarray,
    radial_cutoff,
    sh_fn,
    attr_fn,
    dense: bool = True,
    bond0_embed: Optional[jnp.ndarray] = None,
    bond1_embed: Optional[jnp.ndarray] = None,
    src_pos: Optional[jnp.ndarray] = None,
    src_mask: Optional[jnp.ndarray] = None,
    dst_index: Optional[jnp.ndarray] = None,
) -> EdgeData:
    """Build EdgeData from positions.

    sh_fn(edge_vec[..., 3]) -> [..., sh_dim]
    attr_fn(edge_len[...], bonded: bool) -> [..., A]

    Matches the reference's edge semantics (`denoiser.py:138-166` +
    `e3conv.py:110-127`): the radial edge set (bondedness attr 0) is the
    distance-cutoff graph over *all* pairs including bonded ones; bonded edges
    are an *additional* edge set with bondedness attr 1, so a bonded pair in
    cutoff contributes two messages.

    Atom-sharded mode (SURVEY §5.7): when `src_pos`/`src_mask`/`dst_index` are
    given, `pos`/`node_mask` hold only this shard's LOCAL dst rows while
    src_pos holds the full gathered molecule; `dst_index` maps local rows to
    global atom indices (for the self-edge mask) and `bond_src` indexes the
    gathered src array while `bond_dst` is local.
    """
    G, N, _ = pos.shape
    sh_dense = attr_dense = adj = None
    if src_pos is None:
        src_pos, src_mask = pos, node_mask
    if dense:
        # edge_vec[g, i, j] = pos[src=j] - pos[dst=i]
        edge_vec = src_pos[:, None, :, :] - pos[:, :, None, :]
        dist = jnp.linalg.norm(edge_vec + 1e-12, axis=-1)
        N_src = src_pos.shape[1]
        if dst_index is None:
            eye = jnp.eye(N, N_src, dtype=bool)[None]
        else:
            eye = dst_index[:, :, None] == jnp.arange(N_src)[None, None, :]
        pair_mask = node_mask[:, :, None] & src_mask[:, None, :] & (~eye)
        adj = ((dist < radial_cutoff) & pair_mask).astype(pos.dtype)

        sh_dense = sh_fn(edge_vec)
        attr_dense = attr_fn(dist, bonded=False)

    # Bonded edge features (bond_src indexes src_pos, bond_dst indexes pos).
    bvec = jnp.take_along_axis(src_pos, bond_src[..., None], axis=1) - jnp.take_along_axis(
        pos, bond_dst[..., None], axis=1
    )
    bdist = jnp.linalg.norm(bvec + 1e-12, axis=-1)
    sh_bond = sh_fn(bvec)
    attr_bond = attr_fn(bdist, bonded=True)

    return EdgeData(
        sh_dense=sh_dense,
        attr_dense=attr_dense,
        adj=adj,
        sh_bond=sh_bond,
        attr_bond=attr_bond,
        bond_src=bond_src,
        bond_dst=bond_dst,
        bond_mask=bond_mask.astype(pos.dtype),
        pos=pos,
        node_mask=node_mask,
        radial_cutoff=radial_cutoff,
        bond0_embed=bond0_embed,
        bond1_embed=bond1_embed,
    )
