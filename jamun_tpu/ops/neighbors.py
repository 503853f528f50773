"""Capped neighbor lists — the sparse execution path for large molecules.

TPU replacement for torch_cluster's `radius_graph`
(`/root/reference/src/jamun/model/denoiser.py:149`) in the regime where the
dense masked-adjacency formulation (`jamun_tpu.ops.graph.dense_edge_data`)
stops being the right algorithm: adjacency fill collapses for realistic
chain conformations once N reaches a few hundred atoms (train_idrome scale),
so the O(N^2 * C) dense message work is mostly multiply-by-zero.

Format: a fixed-capacity per-destination neighbor list [G, N, K] holding the
K *nearest* in-cutoff sources per destination atom — static shapes, one
`lax.top_k` over the [N, N_src] distance panel, and the message path becomes
gather + masked mean over K (no scatter; the gather's transpose is XLA's
problem in the backward pass, measured in BENCH_NOTES round 4). The reference
CUDA radius_graph itself caps in-degree (`max_num_neighbors=32`, keeping the
first 32 edges found); keeping the K nearest is the principled version of the
same cap, and `overflow` reports exactly how many edges the cap dropped.

Only the O(N * K) edge *features* are materialized; the O(N^2) distance panel
is transient (never carries the sh/attr feature dims the dense path hauls).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["capped_neighbor_lists", "gather_neighbors", "neighbor_edge_data"]


def gather_neighbors(x_src: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """x_src: [G, N_src, D], nbr_idx: [G, N, K] -> [G, N, K, D]."""
    return jax.vmap(lambda xg, ig: xg[ig])(x_src, nbr_idx)


def capped_neighbor_lists(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    radial_cutoff,
    cap: int,
    src_pos: Optional[jnp.ndarray] = None,
    src_mask: Optional[jnp.ndarray] = None,
    dst_index: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-nearest in-cutoff neighbor lists.

    pos: [G, N, 3] dst positions; node_mask: [G, N]. Atom-sharded mode
    (SURVEY 5.7) mirrors `dense_edge_data`: `src_pos`/`src_mask` hold the full
    gathered molecule and `dst_index` maps local dst rows to global indices
    (for the self-edge mask).

    Returns (nbr_idx [G, N, K] int32, nbr_mask [G, N, K] bool,
    overflow [G] int32 = total edges dropped by the cap per graph). Masked
    slots carry an arbitrary (valid-range) index; consumers must apply
    nbr_mask. Matches `dense_edge_data`'s edge semantics: all pairs in cutoff
    excluding self-edges and padding; bonded edges remain a separate list.
    """
    if src_pos is None:
        src_pos, src_mask = pos, node_mask
    G, N, _ = pos.shape
    N_src = src_pos.shape[1]
    diff = src_pos[:, None, :, :] - pos[:, :, None, :]
    dist = jnp.linalg.norm(diff + 1e-12, axis=-1)  # [G, N, N_src]
    if dst_index is None:
        eye = jnp.eye(N, N_src, dtype=bool)[None]
    else:
        eye = dst_index[:, :, None] == jnp.arange(N_src)[None, None, :]
    in_cut = (dist < radial_cutoff) & node_mask[:, :, None] & src_mask[:, None, :] & (~eye)

    cap = min(cap, N_src)  # top_k requires k <= N_src; K is static anyway
    ranked = jnp.where(in_cut, dist, jnp.inf)
    neg_topk, nbr_idx = jax.lax.top_k(-ranked, cap)  # [G, N, K]
    nbr_mask = jnp.isfinite(neg_topk)
    deg = jnp.sum(in_cut, axis=-1, dtype=jnp.int32)  # true in-cutoff degree
    overflow = jnp.sum(jnp.maximum(deg - cap, 0), axis=-1, dtype=jnp.int32)
    return nbr_idx.astype(jnp.int32), nbr_mask, overflow


def neighbor_edge_data(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    bond_src: jnp.ndarray,
    bond_dst: jnp.ndarray,
    bond_mask: jnp.ndarray,
    radial_cutoff,
    sh_fn,
    attr_fn,
    cap: int,
    bond0_embed: Optional[jnp.ndarray] = None,
    bond1_embed: Optional[jnp.ndarray] = None,
    src_pos: Optional[jnp.ndarray] = None,
    src_mask: Optional[jnp.ndarray] = None,
    dst_index: Optional[jnp.ndarray] = None,
    cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Sparse analog of `dense_edge_data`: EdgeData with the per-neighbor
    fields populated (sh/attr computed only for the [G, N, K] kept edges) and
    the dense [N, N] feature fields left None. Returns (EdgeData, overflow).

    `cache` = (nbr_idx, superset_mask): a Verlet-style cached list built
    within (cutoff + skin) by the walk (`sampling/mcmc.NeighborCachedScore`).
    The O(N^2) build + top_k is skipped; membership comes from the cache and
    the TRUE-cutoff mask is re-evaluated from the current edge lengths, so
    in-cutoff semantics stay exact while the list is valid. overflow is None
    in this mode (counted at rebuild time by the walk)."""
    from jamun_tpu.ops.graph import dense_edge_data

    if cache is not None:
        nbr_idx, sup_mask = cache
        overflow = None
    else:
        nbr_idx, nbr_mask, overflow = capped_neighbor_lists(
            pos, node_mask, radial_cutoff, cap,
            src_pos=src_pos, src_mask=src_mask, dst_index=dst_index,
        )
    sp = src_pos if src_pos is not None else pos
    pos_nbr = gather_neighbors(sp, nbr_idx)  # [G, N, K, 3]
    edge_vec = pos_nbr - pos[:, :, None, :]
    edge_len = jnp.linalg.norm(edge_vec + 1e-12, axis=-1)
    if cache is not None:
        # membership from the cached (cutoff + skin) list; exactness from the
        # per-step true-cutoff mask
        nbr_mask = (sup_mask > 0) & (edge_len < radial_cutoff)
    sh_nbr = sh_fn(edge_vec)
    attr_nbr = attr_fn(edge_len, bonded=False)

    edges = dense_edge_data(
        pos, node_mask, bond_src, bond_dst, bond_mask, radial_cutoff,
        sh_fn=sh_fn, attr_fn=attr_fn, dense=False,
        bond0_embed=bond0_embed, bond1_embed=bond1_embed,
        src_pos=src_pos, src_mask=src_mask, dst_index=dst_index,
    )
    return (
        edges.replace(
            nbr_idx=nbr_idx,
            nbr_mask=nbr_mask.astype(pos.dtype),
            sh_nbr=sh_nbr,
            attr_nbr=attr_nbr,
        ),
        overflow,
    )
