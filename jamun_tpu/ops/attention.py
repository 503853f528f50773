"""Equivariant graph attention (SE(3)-Transformer style) on dense batches.

Reference: `/root/reference/src/jamun/e3tools/nn/_transformer.py:27-365`.
Queries per node, keys/values per edge (Conv-style weighted tensor products),
edge-softmax normalized by the *mean* of exponentials over incoming edges
(reference semantics), attention weight sqrt(relu(alpha)).

Dense form: the pairwise logits are a [G, N, N] masked array — edge-softmax
becomes a masked reduction, no scatter. The bonded edge list participates in
the same softmax via segment sums.
"""

from __future__ import annotations

import itertools
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.ops.graph import EdgeData
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.layer_norm import equivariant_layer_norm
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.mlp import EquivariantMLP, ScalarMLP
from jamun_tpu.ops.precision import matmul_precision
from jamun_tpu.ops.tensor_product import fully_connected_tp

__all__ = ["Attention", "MultiheadAttention", "TransformerBlock", "split_irreps"]


def split_irreps(irreps: Irreps, n_head: int):
    for mi in irreps:
        assert mi.mul % n_head == 0, f"{mi} not divisible by {n_head} heads"
    per_head = Irreps([(mi.mul // n_head, mi.ir) for mi in irreps])
    split = Irreps(list(itertools.chain.from_iterable([list(per_head)] * n_head)))
    assert split.dim == irreps.dim
    return split, per_head


class _PerEdgeConv(nn.Module):
    """Conv's per-edge product without aggregation (`Conv.apply_per_edge`)."""

    irreps_in: Irreps
    irreps_out: Irreps
    irreps_sh: Irreps
    edge_attr_dim: int

    def setup(self):
        self.tp = fully_connected_tp(self.irreps_in, self.irreps_sh, self.irreps_out)
        self.radial_nn = ScalarMLP(
            out_features=self.tp.weight_numel, hidden_features=[self.edge_attr_dim]
        )

    def __call__(self, src_attr, edge_attr, edge_sh):
        return self.tp(src_attr, edge_sh, self.radial_nn(edge_attr))


class MultiheadAttention(nn.Module):
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    irreps_sh: Union[str, Irreps]
    irreps_query: Union[str, Irreps]
    irreps_key: Union[str, Irreps]
    edge_attr_dim: int
    n_head: int = 1

    @nn.compact
    def __call__(self, node_attr: jnp.ndarray, edges: EdgeData) -> jnp.ndarray:
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        irreps_sh = Irreps(self.irreps_sh)
        q_split, q_head = split_irreps(Irreps(self.irreps_query), self.n_head)
        k_split, k_head = split_irreps(Irreps(self.irreps_key), self.n_head)
        o_split, o_head = split_irreps(irreps_out, self.n_head)

        G, N, _ = node_attr.shape
        B = edges.bond_src.shape[1]
        H = self.n_head

        h_q = IrrepsLinear(irreps_in, q_split)
        h_k = _PerEdgeConv(irreps_in, k_split, irreps_sh, self.edge_attr_dim)
        h_v = _PerEdgeConv(irreps_in, o_split, irreps_sh, self.edge_attr_dim)
        dot = fully_connected_tp(q_head, k_head, Irreps("1x0e"))
        dot_w = self.param("dot_w", nn.initializers.normal(1.0), (dot.weight_numel,))

        q = h_q(node_attr).reshape(G, N, H, -1)  # per dst node

        src_attr = jnp.broadcast_to(node_attr[:, None, :, :], (G, N, N, node_attr.shape[-1]))
        k = h_k(src_attr, edges.attr_dense, edges.sh_dense).reshape(G, N, N, H, -1)
        v = h_v(src_attr, edges.attr_dense, edges.sh_dense).reshape(G, N, N, H, -1)

        src_b = jnp.take_along_axis(node_attr, edges.bond_src[..., None], axis=1)
        k_b = h_k(src_b, edges.attr_bond, edges.sh_bond).reshape(G, B, H, -1)
        v_b = h_v(src_b, edges.attr_bond, edges.sh_bond).reshape(G, B, H, -1)

        # logits: invariant contraction of q[dst] with per-edge keys
        q_dense = jnp.broadcast_to(q[:, :, None], (G, N, N, H, q.shape[-1]))
        logits = dot(q_dense, k, dot_w)[..., 0]  # [G, N(dst), N(src), H]
        q_bond = jnp.take_along_axis(
            q.reshape(G, N, -1), edges.bond_dst[..., None], axis=1
        ).reshape(G, B, H, -1)
        logits_b = dot(q_bond, k_b, dot_w)[..., 0]  # [G, B, H]

        # softmax over incoming edges, normalized by the MEAN of exps (reference)
        exp = jnp.exp(logits) * edges.adj[..., None]
        exp_b = jnp.exp(logits_b) * edges.bond_mask[..., None]

        def seg_sum(x, dst):
            return jax.vmap(lambda m, d: jax.ops.segment_sum(m, d, num_segments=N))(x, dst)

        z_sum = jnp.sum(exp, axis=2) + seg_sum(exp_b, edges.bond_dst)  # [G, N, H]
        deg = jnp.sum(edges.adj, axis=-1) + seg_sum(
            edges.bond_mask[..., None], edges.bond_dst
        )[..., 0]
        z = z_sum / jnp.maximum(deg, 1.0)[..., None]  # mean of exps per dst

        alpha = exp / jnp.maximum(z[:, :, None], 1e-20)
        attn = jnp.sqrt(jax.nn.relu(alpha))
        out = jnp.einsum(
            "gijh,gijhd->gihd", attn, v, precision=matmul_precision(attn.dtype)
        ).reshape(G, N, -1)

        z_bond = jnp.take_along_axis(z, edges.bond_dst[..., None], axis=1)  # [G, B, H]
        alpha_b = exp_b / jnp.maximum(z_bond, 1e-20)
        attn_b = jnp.sqrt(jax.nn.relu(alpha_b))
        out = out + seg_sum((attn_b[..., None] * v_b).reshape(G, B, -1), edges.bond_dst)

        return IrrepsLinear(o_split, irreps_out)(out)


class Attention(MultiheadAttention):
    """Single-head attention (reference `_transformer.py:27-133`)."""

    n_head: int = 1


class TransformerBlock(nn.Module):
    """Attention + feed-forward, each wrapped in LinearSelfInteraction and
    equivariant layer norm (reference `_transformer.py:263-365`)."""

    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    irreps_sh: Union[str, Irreps]
    edge_attr_dim: int
    n_head: int = 1
    irreps_query: Optional[str] = None
    irreps_key: Optional[str] = None

    @nn.compact
    def __call__(self, node_attr: jnp.ndarray, edges: EdgeData) -> jnp.ndarray:
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        irreps_q = Irreps(self.irreps_query) if self.irreps_query else irreps_in
        irreps_k = Irreps(self.irreps_key) if self.irreps_key else irreps_in

        attn = MultiheadAttention(
            irreps_in, irreps_out, self.irreps_sh, irreps_q, irreps_k, self.edge_attr_dim, self.n_head
        )
        # LinearSelfInteraction around attention
        skip = IrrepsLinear(irreps_in, irreps_out)(node_attr)
        x = attn(node_attr, edges)
        x = IrrepsLinear(irreps_out, irreps_out)(x) + skip
        x = equivariant_layer_norm(x, irreps_out)

        ff_hidden = Irreps([(4 * mi.mul, mi.ir) for mi in irreps_out])
        ff = EquivariantMLP(irreps_out, irreps_out, [ff_hidden])
        skip2 = IrrepsLinear(irreps_out, irreps_out)(x)
        y = ff(x)
        y = IrrepsLinear(irreps_out, irreps_out)(y) + skip2
        return equivariant_layer_norm(y, irreps_out)
