"""Ophiuchus: hierarchical residue-level denoiser architecture.

Reference: `/root/reference/src/jamun/model/arch/ophiuchus.py:432-573`
(refs arXiv 2310.02508): atoms pool to residues anchored at the alpha carbon,
message passing runs on a residue-level radius graph, and an output head
predicts base (CA) + relative atom coordinates.

TPU-first: the reference builds the residue layout with Python loops over a
ragged batch every forward (`ophiuchus.py:180-220`); here the [G, R, P] gather
maps are computed once on the host at batch construction
(`GraphBatch.residue_atom_index` etc.) and the forward is pure gathers.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.models.e3conv import vector_to_irreps, irreps_to_vector
from jamun_tpu.models.noise_conditioning import NoiseConditionalScaling, NoiseConditionalSkipConnection
from jamun_tpu.ops.conv import ConvBlock
from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.graph import EdgeData, GraphBatch
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.radial import soft_one_hot_linspace
from jamun_tpu.ops.sh import spherical_harmonics
from jamun_tpu.ops.cg import real_wigner_3j

__all__ = ["Ophiuchus", "tensor_square"]

_embed_init = nn.initializers.normal(stddev=1.0)


def _square_output_blocks(irreps_in: Irreps) -> Tuple[Irreps, List]:
    """Output blocks + instructions of the unweighted symmetric tensor square
    (e3nn `o3.TensorSquare` parity): pairs (i <= j); for i == j only the
    symmetric couplings (even l3 for l1 == l2)."""
    out_blocks: List = []
    instructions = []
    for i, mi in enumerate(irreps_in):
        for j, mj in enumerate(irreps_in):
            if j < i:
                continue
            for ir3 in mi.ir * mj.ir:
                if i == j and (mi.ir.l + mj.ir.l + ir3.l) % 2 == 1:
                    continue  # antisymmetric coupling vanishes in the square
                instructions.append((i, j, len(out_blocks), mi.mul * mj.mul, ir3))
                out_blocks.append((mi.mul * mj.mul, ir3))
    return Irreps(out_blocks), instructions


def tensor_square(x: jnp.ndarray, irreps_in: Irreps) -> Tuple[jnp.ndarray, Irreps]:
    """Unweighted symmetric tensor square of packed irreps features."""
    irreps_in = Irreps(irreps_in)
    irreps_out, instructions = _square_output_blocks(irreps_in)
    sl = irreps_in.slices()
    batch_shape = x.shape[:-1]
    blocks = []
    for i, j, k, mul_out, ir3 in instructions:
        mi, mj = irreps_in[i], irreps_in[j]
        f1 = x[..., sl[i]].reshape(batch_shape + (mi.mul, mi.ir.dim))
        f2 = x[..., sl[j]].reshape(batch_shape + (mj.mul, mj.ir.dim))
        C = jnp.asarray(
            real_wigner_3j(mi.ir.l, mj.ir.l, ir3.l) * np.sqrt(ir3.dim), dtype=x.dtype
        )
        blk = jnp.einsum("...ui,...vj,ijk->...uvk", f1, f2, C)
        blocks.append(blk.reshape(batch_shape + (mul_out * ir3.dim,)))
    return jnp.concatenate(blocks, axis=-1), irreps_out


class SelfInteraction(nn.Module):
    """Tensor-square self interaction (`ophiuchus.py:253-311`): factor the
    multiplicity to an axis, square, concat with input, gated linear."""

    irreps_in: Irreps
    mul_factor: int

    @nn.compact
    def __call__(self, features: jnp.ndarray, c_noise: jnp.ndarray) -> jnp.ndarray:
        irreps_in = Irreps(self.irreps_in)
        # mul_to_axis: [..., D] -> [..., factor, D/factor]
        factored_irreps = Irreps([(mi.mul // self.mul_factor, mi.ir) for mi in irreps_in])
        sl = irreps_in.slices()
        batch_shape = features.shape[:-1]
        parts = []
        for s, mi, fi in zip(sl, irreps_in, factored_irreps):
            f = features[..., s].reshape(batch_shape + (self.mul_factor, fi.mul, mi.ir.dim))
            parts.append(f.reshape(batch_shape + (self.mul_factor, fi.mul * mi.ir.dim)))
        factored = jnp.concatenate(parts, axis=-1)  # [..., factor, factored.dim]

        squared, irreps_sq = tensor_square(factored, factored_irreps)
        # axis_to_mul: collapse factor axis back into multiplicities
        sq_sl = irreps_sq.slices()
        merged = []
        for s, mi in zip(sq_sl, irreps_sq):
            f = squared[..., s].reshape(batch_shape + (self.mul_factor * mi.mul, mi.ir.dim))
            merged.append(f.reshape(batch_shape + (self.mul_factor * mi.mul * mi.ir.dim,)))
        squared_flat = jnp.concatenate(merged, axis=-1)
        irreps_sq_full = Irreps([(self.mul_factor * mi.mul, mi.ir) for mi in irreps_sq])

        gate = Gate(irreps_in)
        x = jnp.concatenate([features, squared_flat], axis=-1)
        x = IrrepsLinear(irreps_in + irreps_sq_full, gate.irreps_in)(x)
        x = gate(x)
        x = NoiseConditionalScaling(gate.irreps_out)(x, c_noise)
        return x


class Ophiuchus(nn.Module):
    irreps_out: str = "1x1e"
    irreps_hidden: str = "64x0e + 64x1e"
    irreps_sh: str = "1x0e + 1x1e"
    n_layers: int = 4
    mul_factor: int = 64
    edge_attr_dim: int = 8
    atom_type_embedding_dim: int = 8
    atom_code_embedding_dim: int = 8
    residue_code_embedding_dim: int = 32
    residue_index_embedding_dim: int = 8
    use_residue_sequence_index: bool = False
    tensor_product: str = "uvw"
    dtype: Any = None
    max_atoms_in_residue: int = 16
    max_sequence_length: int = 20

    @nn.compact
    def __call__(
        self, batch: GraphBatch, c_noise: jnp.ndarray, radial_cutoff: jnp.ndarray
    ) -> jnp.ndarray:
        assert batch.residue_atom_index is not None, (
            "Ophiuchus needs the residue layout; collate with "
            "BucketSpec(with_residue_layout=True)"
        )
        irreps_hidden = Irreps(self.irreps_hidden)
        irreps_sh = Irreps(self.irreps_sh)
        irreps_out = Irreps(self.irreps_out)
        P = batch.residue_atom_index.shape[-1]
        G, R = batch.residue_mask.shape

        # --- pool atoms to residues anchored at CA (`to_residue_data`) ---
        base_coords = jnp.take_along_axis(batch.pos, batch.residue_ca_index[..., None], axis=1)  # [G,R,3]
        atom_pos = jnp.take_along_axis(
            batch.pos, batch.residue_atom_index.reshape(G, R * P)[..., None], axis=1
        ).reshape(G, R, P, 3)
        rel_coords = (atom_pos - base_coords[:, :, None, :]) * batch.residue_atom_mask[..., None]

        def gather_per_atom(arr):  # [G, N] -> [G, R, P]
            return jnp.take_along_axis(
                arr, batch.residue_atom_index.reshape(G, R * P), axis=1
            ).reshape(G, R, P)

        atom_codes = gather_per_atom(batch.atom_code_index) * batch.residue_atom_mask
        atom_types = gather_per_atom(batch.atom_type_index) * batch.residue_atom_mask

        # --- initial residue embedding (`InitialResidueEmbedding`) ---
        code_emb = nn.Embed(7, self.atom_code_embedding_dim, embedding_init=_embed_init)(atom_codes)
        type_emb = nn.Embed(6, self.atom_type_embedding_dim, embedding_init=_embed_init)(atom_types)
        code_emb = (code_emb * batch.residue_atom_mask[..., None]).reshape(G, R, -1)
        type_emb = (type_emb * batch.residue_atom_mask[..., None]).reshape(G, R, -1)
        res_emb = nn.Embed(23, self.residue_code_embedding_dim, embedding_init=_embed_init)(
            batch.residue_codes
        )
        feats = [
            vector_to_irreps(rel_coords).reshape(G, R, P * 3),  # P x 1e block
            code_emb,
            type_emb,
            res_emb,
        ]
        irreps_embed = Irreps(
            f"{P}x1e + {P * self.atom_code_embedding_dim}x0e + "
            f"{P * self.atom_type_embedding_dim}x0e + {self.residue_code_embedding_dim}x0e"
        )
        if self.use_residue_sequence_index:
            seq_idx = jnp.clip(
                jnp.arange(R)[None].repeat(G, 0), 0, self.max_sequence_length - 1
            )
            feats.append(
                nn.Embed(self.max_sequence_length, self.residue_index_embedding_dim, embedding_init=_embed_init)(seq_idx)
            )
            irreps_embed = irreps_embed + Irreps(f"{self.residue_index_embedding_dim}x0e")
        features = jnp.concatenate(feats, axis=-1)
        features = IrrepsLinear(irreps_embed, irreps_hidden)(features)

        # --- residue-level radius graph (dense, no bonded edges) ---
        edge_vec = base_coords[:, None, :, :] - base_coords[:, :, None, :]
        dist = jnp.linalg.norm(edge_vec + 1e-12, axis=-1)
        eye = jnp.eye(R, dtype=bool)[None]
        adj = (
            (dist < radial_cutoff)
            & batch.residue_mask[:, :, None]
            & batch.residue_mask[:, None, :]
            & (~eye)
        )
        sh_dense = spherical_harmonics(irreps_sh, edge_vec)
        attr_dense = soft_one_hot_linspace(
            dist, 0.0, radial_cutoff, self.edge_attr_dim, basis="gaussian", cutoff=True
        )
        empty = jnp.zeros((G, 0), jnp.int32)
        edges = EdgeData(
            sh_dense=sh_dense,
            attr_dense=attr_dense,
            adj=adj.astype(features.dtype),
            sh_bond=jnp.zeros((G, 0, irreps_sh.dim), features.dtype),
            attr_bond=jnp.zeros((G, 0, self.edge_attr_dim), features.dtype),
            bond_src=empty,
            bond_dst=empty,
            bond_mask=jnp.zeros((G, 0), features.dtype),
        )

        # --- blocks: SelfInteraction -> SpatialConvolution, noise-conditioned ---
        for _ in range(self.n_layers):
            new = SelfInteraction(irreps_hidden, self.mul_factor)(features, c_noise)
            new = ConvBlock(
                irreps_in=irreps_hidden,
                irreps_out=irreps_hidden,
                irreps_sh=irreps_sh,
                edge_attr_dim=self.edge_attr_dim,
                tensor_product=self.tensor_product,
                dtype=self.dtype,
            )(new, edges)
            new = NoiseConditionalScaling(irreps_hidden)(new, c_noise)
            features = NoiseConditionalSkipConnection(irreps_hidden)(features, new, c_noise)

        # --- output head: base + relative coordinates (`OutputHead`) ---
        base_out = IrrepsLinear(irreps_hidden, irreps_out)(features)  # [G, R, 3]
        rel_out = IrrepsLinear(
            irreps_hidden, Irreps([(P * mi.mul, mi.ir) for mi in irreps_out])
        )(features).reshape(G, R, P, 3)

        base_xyz = irreps_to_vector(base_out)
        rel_xyz = irreps_to_vector(rel_out)
        # CA atoms have zero relative coords (`to_atom_data`, ophiuchus.py:77-79)
        is_ca = atom_codes == 4
        rel_xyz = jnp.where(is_ca[..., None], 0.0, rel_xyz)
        atom_out = (base_xyz[:, :, None, :] + rel_xyz) * batch.residue_atom_mask[..., None]

        # scatter residue-layout atoms back to the flat [G, N] layout
        N = batch.pos.shape[1]
        flat_idx = batch.residue_atom_index.reshape(G, R * P)
        flat_val = atom_out.reshape(G, R * P, 3) * batch.residue_atom_mask.reshape(G, R * P)[..., None]
        out = jnp.zeros((G, N, 3), flat_val.dtype)
        out = jax.vmap(lambda o, i, v: o.at[i].add(v))(out, flat_idx, flat_val)
        # output is in xyz already; convert to the (y,z,x) irreps layout expected
        # by the denoiser (`irreps_to_vector` is applied there)
        return vector_to_irreps(out) * batch.node_mask[..., None]
